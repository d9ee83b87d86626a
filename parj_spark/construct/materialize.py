"""Stage 6: graph materialization — SPO/POS/OSP permutation tables + stats.

Spark-first re-expression of PARJ's in-memory permutation indexes
(/root/reference/parj.c:89-104: per-predicate sorted firstArrays/secondArrays
CSR): each sort order becomes a parquet table partitioned by predicate and
sorted within files, so parquet row-group min/max stats give the same
"binary search into the sorted run" pruning the reference hand-codes
(parj.c:1479-1505), and sort-merge joins over co-sorted data get the
sequential-adjacent access pattern of its leapfrog-ish NLJ (SURVEY.md §2.10).

Skew: hot predicates (rdf:type) are salted — `salt = xxhash64(sort_key) % B`
joins the repartition key so one predicate's data spreads over B parallel
writers/readers; this is the reference's `secondShard` hot-key defuser
(parj.c:988-1014, SURVEY.md §2.1 S6) done the Spark way.

Stats table = reference's stat vtab mode 0/1 (parj.c:311-364): per-predicate
counts + distincts for the query planner's join ordering.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 8


def _write_permutation(
    triples: DataFrame,
    path: str,
    sort_cols: list[str],
    salt_buckets: int,
) -> None:
    salted = triples.withColumn(
        "salt", F.pmod(F.xxhash64(sort_cols[0]), F.lit(salt_buckets)).cast("int")
    )
    (
        salted.repartition("p", "salt")
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy("p")
        .parquet(path)
    )


def write_graph(
    triples_enc: DataFrame,
    dict_df: DataFrame,
    props_df: DataFrame,
    out_dir: str,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> None:
    from concurrent.futures import ThreadPoolExecutor

    triples_enc = triples_enc.cache()
    triples_enc.count()  # materialize once; all six writers read the cache

    def w_spo():
        _write_permutation(triples_enc, os.path.join(out_dir, "spo"), ["s", "o"], salt_buckets)

    def w_pos():
        _write_permutation(triples_enc, os.path.join(out_dir, "pos"), ["o", "s"], salt_buckets)

    def w_osp():
        # OSP: object-first global order for variable-predicate access paths
        (
            triples_enc.repartitionByRange(F.col("o"))
            .sortWithinPartitions("o", "s", "p")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "osp"))
        )

    def w_stats():
        stats = triples_enc.groupBy("p").agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("s").alias("ndv_s"),
            F.approx_count_distinct("o").alias("ndv_o"),
            F.min("s").alias("min_s"),
            F.max("s").alias("max_s"),
            F.min("o").alias("min_o"),
            F.max("o").alias("max_o"),
        )
        stats.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))

    def w_dict():
        dict_df.write.mode("overwrite").parquet(os.path.join(out_dir, "dict"))

    def w_props():
        props_df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "properties")
        )

    # the six writers are independent Spark jobs over the cached triples —
    # submit them concurrently so the scheduler interleaves their stages
    # (hides per-job latency; same pattern works on a real cluster)
    with ThreadPoolExecutor(max_workers=6) as pool:
        futures = [pool.submit(f) for f in (w_spo, w_pos, w_osp, w_stats, w_dict, w_props)]
        for fut in futures:
            fut.result()
    triples_enc.unpersist()
