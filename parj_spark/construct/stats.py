"""Join-cardinality statistics — reference stat vtab mode 2 re-expressed.

PARJ samples pairwise predicate join cardinalities with a capped
merge-intersection walk over sorted arrays (parj.c:365-501, STATLIMIT cap,
32-thread driver MemoryStat.java:324-428). The Spark-first equivalent is one
aggregation job: per (predicate, join-column) key histograms, joined and
summed — exact, distributed, and O(|triples|) instead of O(pairs x walk).

Orientations follow the reference encoding (parj.c:447-466):
  SS: subject of p1 = subject of p2     SO: subject of p1 = object  of p2
  OS: object  of p1 = subject of p2     OO: object  of p1 = object  of p2

Output: (p1, p2, orientation, card) — consumed by the BGP planner's greedy
join ordering to score candidate next-patterns by *joined* size rather than
scan size alone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORIENTATIONS = {
    "SS": ("s", "s"),
    "SO": ("s", "o"),
    "OS": ("o", "s"),
    "OO": ("o", "o"),
}


def _key_hists(
    triples_enc: DataFrame, per_key_cap: int | None = None
) -> dict[str, DataFrame]:
    """Per-(predicate, join-key) frequency histograms for both columns —
    the shared input of every T3 variant. Not persisted here: within one
    action the identical groupBy subplans are deduplicated by Spark's
    exchange reuse; multi-action callers (write_join_stats) persist and
    unpersist around their writes."""
    hists = {}
    for col in ("s", "o"):
        h = triples_enc.groupBy("p", F.col(col).alias("k")).agg(
            F.count("*").alias("n")
        )
        if per_key_cap is not None:
            h = h.withColumn("n", F.least(F.col("n"), F.lit(per_key_cap)))
        hists[col] = h
    return hists


def _pairwise_from_hists(hists: dict[str, DataFrame]) -> DataFrame:
    parts = []
    for name, (c1, c2) in ORIENTATIONS.items():
        a = hists[c1].select(F.col("p").alias("p1"), "k", F.col("n").alias("n1"))
        b = hists[c2].select(F.col("p").alias("p2"), "k", F.col("n").alias("n2"))
        parts.append(
            a.join(b, "k")
            .groupBy("p1", "p2")
            .agg(F.sum(F.col("n1") * F.col("n2")).alias("card"))
            .select("p1", "p2", F.lit(name).alias("orientation"), "card")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def pairwise_join_cardinalities(
    triples_enc: DataFrame, per_key_cap: int | None = None
) -> DataFrame:
    """Exact join cardinality for every predicate pair and orientation.

    ``per_key_cap``: optional per-key frequency cap mirroring the
    reference's STATLIMIT sampling guard — with a cap the result is a
    lower-bound estimate but immune to degenerate hub keys.
    """
    return _pairwise_from_hists(_key_hists(triples_enc, per_key_cap))


def class_restricted_join_cardinalities(
    triples_enc: DataFrame,
    type_pid: int,
    top_k: int = 64,
    per_key_cap: int | None = None,
) -> DataFrame:
    """T3 restricted to an rdf:type class — the reference's
    ``getTypeCardinality`` (parj.c:510-547; negative-ID type pseudo-tables,
    MemoryStat.java:273, 301): join cardinality per (class, p1, p2,
    orientation) counting only join keys that are instances of the class.

    Only the ``top_k`` largest classes are materialized (storage is
    K x pairs x orientations); the planner falls back to the unrestricted
    T3 entry for untracked classes. One aggregation job like the
    unrestricted version — the class filter is a semi-join of the per-key
    histogram against the (broadcastable after top-k) instance set.
    """
    return _class_from_hists(
        triples_enc, _key_hists(triples_enc, per_key_cap), type_pid, top_k
    )


def _class_from_hists(
    triples_enc: DataFrame,
    hists: dict[str, DataFrame],
    type_pid: int,
    top_k: int,
) -> DataFrame:
    inst = triples_enc.filter(F.col("p") == type_pid).select(
        F.col("s").alias("k"), F.col("o").alias("cls")
    )
    top = (
        inst.groupBy("cls")
        .agg(F.count("*").alias("sz"))
        .orderBy(F.desc("sz"), F.asc("cls"))
        .limit(top_k)
        .select("cls")
    )
    inst = inst.join(F.broadcast(top), "cls")

    parts = []
    for name, (c1, c2) in ORIENTATIONS.items():
        # restricting side-1's keys to class instances restricts the join
        # keys themselves, so side-2 needs no separate filter
        a = (
            hists[c1]
            .join(inst, "k")
            .select("cls", F.col("p").alias("p1"), "k", F.col("n").alias("n1"))
        )
        b = hists[c2].select(F.col("p").alias("p2"), "k", F.col("n").alias("n2"))
        parts.append(
            a.join(b, "k")
            .groupBy("cls", "p1", "p2")
            .agg(F.sum(F.col("n1") * F.col("n2")).alias("card"))
            .select("cls", "p1", "p2", F.lit(name).alias("orientation"), "card")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def write_join_stats(
    triples_enc: DataFrame,
    out_dir: str,
    type_pid: int | None = None,
    class_top_k: int = 64,
    per_key_cap: int | None = None,
) -> None:
    """Write the unrestricted T3 table and (when rdf:type exists) the
    class-restricted one. Both derive from the same per-key histograms, so
    those are built ONCE, persisted across the two write actions, and
    released afterwards — previously each table rebuilt them (4 duplicated
    shuffles) and leaked the persisted frames, making the analyze phase
    cost more than construction at the 8M-triple bench scale."""
    from concurrent.futures import ThreadPoolExecutor

    hists = _key_hists(triples_enc, per_key_cap)
    multi_action = type_pid is not None
    if multi_action:
        hists = {c: h.persist() for c, h in hists.items()}

    def w_plain():
        _pairwise_from_hists(hists).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "join_stats")
        )

    def w_class():
        _class_from_hists(
            triples_enc, hists, type_pid, class_top_k
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "class_join_stats")
        )

    try:
        if multi_action:
            with ThreadPoolExecutor(max_workers=2) as pool:
                futures = [pool.submit(w) for w in (w_plain, w_class)]
                for fut in futures:
                    fut.result()
        else:
            w_plain()
    finally:
        if multi_action:
            for h in hists.values():
                h.unpersist()


DEFAULT_HIST_BUCKETS = 16


def equi_depth_histograms(
    triples_enc: DataFrame, n_buckets: int = DEFAULT_HIST_BUCKETS
) -> DataFrame:
    """Per-(predicate, column) equi-depth histograms — the reference's
    Histogram.java:106-212 selectivity structure, built the Spark way.

    Two passes, both scale-safe (no per-predicate global sort):
      1. approx_percentile per predicate -> bucket boundaries (tiny result);
      2. boundary arrays broadcast back, bucket index = #boundaries < value
         (JVM-side array filter), then one groupBy for per-bucket
         (count, ndv, min, max).

    Output: (p, col, bucket, lo, hi, n, ndv) — consumed by the planner for
    constant-equality selectivity on skewed predicates, where the uniform
    n/ndv estimate is systematically wrong (VERDICT r1 missing #4).
    """
    fractions = [i / n_buckets for i in range(1, n_buckets)]
    parts = []
    for col in ("s", "o"):
        bnds = triples_enc.groupBy("p").agg(
            F.percentile_approx(col, fractions, 10_000).alias("bnds")
        )
        bucketed = (
            triples_enc.join(F.broadcast(bnds), "p")
            .withColumn(
                "bucket",
                F.size(F.filter("bnds", lambda b: b < F.col(col))).cast("int"),
            )
            .groupBy("p", "bucket")
            .agg(
                F.count("*").alias("n"),
                F.approx_count_distinct(col).alias("ndv"),
                F.min(col).alias("lo"),
                F.max(col).alias("hi"),
            )
            .select("p", F.lit(col).alias("col"), "bucket", "lo", "hi", "n", "ndv")
        )
        parts.append(bucketed)
    return parts[0].unionByName(parts[1])


def write_histograms(
    triples_enc: DataFrame, out_dir: str, n_buckets: int = DEFAULT_HIST_BUCKETS
) -> None:
    equi_depth_histograms(triples_enc, n_buckets).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "histograms"))
