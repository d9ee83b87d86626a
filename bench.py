#!/usr/bin/env python
"""Benchmark harness: headline queries + KG construction throughput.

Prints ONE JSON line:
  {"metric": "suite_wall_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "triples_per_sec": ...}

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_DEPTS         KG corpus scale in departments (default 2000)
  BENCH_OUT           graph materialization dir (default tmp)

Timing protocol mirrors the reference harness (README.md:66;
QueryTester.java:170, 293-308): BENCH_REPS runs per query (default 11), the
first discarded as warm-up, the remaining averaged; the suite also reports
the geometric mean over per-query averages. Construction is one timed run
after a full warm-up pipeline (a multi-minute job is its own warm-up; its
variance is in the per-stage lineage, not rep noise).

Extra env: BENCH_REPS  runs per query incl. the discarded first (default 11)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from parj_spark.session import get_spark  # noqa: E402
from parj_spark import contract  # noqa: E402
from parj_spark.fixtures import gen_corpus  # noqa: E402
from parj_spark.construct import run_pipeline  # noqa: E402
from parj_spark.construct.pipeline import analyze_graph  # noqa: E402
from parj_spark.query import BGPEngine, parse_bgp  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_semijoin",
    "q07_left_join_agg",
    "q10_window_topk",
    "q13_sessionize",
    "kg_bgp_chain",
    "kg_sparql_update",
    "kg_sparql_graph",
    "dedup_exact",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_stats",
    "text_fingerprint",
    # corpus-curation tier (round 4): repetition signals are two
    # explode+agg passes, substring spans a posexplode + hash-key agg,
    # PII redaction a pure map — all JVM-side
    "text_repetition",
    "dedup_substring",
    "text_pii_redact",
    # materialized transitive closure (reason.py): O(log depth) path
    # doubling, one self-join shuffle per round on the closing slice only
    "kg_transitive_closure",
]

# Bench-scale dedup variants: discriminative 3-word shingles + bucket-size
# skew guard. The contract's unigram variants are correctness fixtures; on
# this synthetic near-identical corpus they intentionally degenerate to
# O(n^2) pairs, which is the wrong workload shape to time at sf>=0.1.
BENCH_EXTRA = {
    "dedup_minhash_3sh": lambda spark, sf_dir: contract.dedup.minhash_lsh_pairs(
        contract._t(spark, sf_dir, "documents"),
        n_hashes=8,
        bands=4,
        shingle_n=3,
        jaccard_threshold=0.4,
        max_bucket=200,
    ),
    "dedup_jaccard_3gram": lambda spark, sf_dir: contract.dedup.ngram_jaccard_pairs(
        contract._t(spark, sf_dir, "documents"),
        shingle_n=3,
        threshold=0.2,
        max_df=200,  # document-frequency cap: no uncapped hot-shingle join
    ),
    # Near-dup at a *near-dup* threshold (0.9 ~ 25 deg) over a corpus with
    # planted duplicates (each vector twice): this is the angle band-LSH
    # actually prunes — random pairs collide in ~(1/2)^planes of bands while
    # every true dup pair survives all bands. The contract variant runs
    # threshold 0.4 as a recall fixture; a 66-deg "near"-dup is not a
    # prunable workload and would time as brute force.
    "sim_lsh_neardup": lambda spark, sf_dir: contract.similarity.cosine_lsh_neardup_pairs(
        _with_planted_dups(contract._t(spark, sf_dir, "embeddings")),
        threshold=0.9,
        n_planes=8,
        n_bands=8,
        max_bucket=10_000,
    ),
    # SemDeDup over the planted-dup corpus at a true near-dup threshold:
    # cell-bucketed pair join + distributed union-find closure
    "sim_semantic_dedup": lambda spark, sf_dir: contract.similarity.semantic_dedup(
        _with_planted_dups(contract._t(spark, sf_dir, "embeddings")),
        threshold=0.9,
        n_centroids=32,
    ),
}


def _with_planted_dups(emb):
    from pyspark.sql import functions as F

    dup = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    return emb.select("vec_id", "embedding", "label").union(dup)

# LUBM-analog suite mirroring the reference's embedded queries
# (QueryTester.java:107-119 shapes) on the fixture ontology
BGP_QUERIES = {
    # Q1-like: selective type + constant-object pattern
    "bgp_q1_course_takers": """
        ?x ub:takesCourse ub:Course_0_0_0 .
        ?x rdf:type ub:GraduateStudent .
    """,
    # Q2-like: type scan + attribute
    "bgp_q2_course_names": "?x rdf:type ub:Course . ?x ub:name ?y .",
    # Q4-like: star with 3 attributes bound to a constant department
    "bgp_q4_prof_profile": """
        ?x ub:worksFor ub:Department_0_0 .
        ?x rdf:type ub:FullProfessor .
        ?x ub:name ?n .
        ?x ub:emailAddress ?e .
        ?x ub:telephone ?t .
    """,
    # Q9-like triangle
    "bgp_q9_triangle": """
        ?s ub:advisor ?p .
        ?s ub:takesCourse ?c .
        ?p ub:teacherOf ?c .
    """,
    # chain with hot rdf:type tail
    "bgp_chain_member": """
        ?x ub:memberOf ?d .
        ?d ub:subOrganizationOf ?u .
        ?u rdf:type ub:University .
    """,
    # unbound-predicate-free 2-hop with degree join
    "bgp_degree_from": """
        ?g ub:undergraduateDegreeFrom ?u .
        ?g ub:advisor ?p .
        ?p ub:worksFor ?d .
        ?d ub:subOrganizationOf ?u2 .
    """,
}


def _timed_reps(fn, reps: int) -> list[float]:
    """Run ``fn`` (an action) ``reps`` times; drop run 1 (warm-up), return
    the kept wall times (reference protocol, QueryTester.java:293-296)."""
    kept = []
    for rep in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        if rep > 0 or reps == 1:
            kept.append(dt)
    return kept


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_depts = int(os.environ.get("BENCH_DEPTS", "2000"))
    reps = int(os.environ.get("BENCH_REPS", "11"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark(app="parj_spark_bench", cpus=cpus)
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}

    def record(name, action):
        kept = _timed_reps(action, reps)
        timings[name] = round(sum(kept) / len(kept), 3)
        spread[name] = [round(min(kept), 3), round(max(kept), 3)]

    for name in HEADLINE:
        record(name, lambda: contract.QUERIES[name](spark, sf_dir).count())

    for name, fn in BENCH_EXTRA.items():
        record(name, lambda: fn(spark, sf_dir).count())

    # KG construction throughput on the interleaved-docs corpus.
    # Warm-up pipeline first (reference protocol: run 1 discarded, the JIT
    # and python-worker warmup otherwise dominates at this corpus size).
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    wdocs, _ = gen_corpus(spark, n_depts=50, seed=42)
    run_pipeline(spark, wdocs, warm_dir, resume=False)
    shutil.rmtree(warm_dir, ignore_errors=True)

    out_dir = os.environ.get("BENCH_OUT") or tempfile.mkdtemp(prefix="bench_kg_")
    cleanup = "BENCH_OUT" not in os.environ
    docs, _ = gen_corpus(spark, n_depts=n_depts, seed=42)
    docs = docs.cache()
    n_docs = docs.count()  # materialize corpus outside the timed window
    t0 = time.time()
    store = run_pipeline(spark, docs, out_dir, resume=False, analyze=False)
    n_triples = store.spo().count()
    t_construct = time.time() - t0
    timings["kg_construct"] = round(t_construct, 3)

    # optimizer statistics (T2/T3/histograms), timed apart like the
    # reference's analyze phase (histograms.json built outside load)
    t0 = time.time()
    analyze_graph(store, resume=False)
    timings["kg_analyze"] = round(time.time() - t0, 3)

    # BGP suite over the materialized graph
    engine = BGPEngine(store)
    for name, q in BGP_QUERIES.items():
        pats = parse_bgp(q)
        record(name, lambda: engine.count(pats))

    # the reference's own entry path: a LUBM Q7 SPARQL string, parsed fresh
    # each rep (parse cost is part of the measured query, as in
    # QueryTester.java where parseQuery sits inside the timed loop)
    lubm7 = (
        "PREFIX rdf:<rdf:> PREFIX ub:<ub:> "
        "SELECT ?x ?y ?z WHERE { ?y ub:teacherOf ?z . "
        "?y rdf:type ub:FullProfessor . ?z rdf:type ub:Course . "
        "?x ub:advisor ?y . ?x rdf:type ub:UndergraduateStudent . "
        "?x ub:takesCourse ?z }"
    )
    record("bgp_sparql_lubm7", lambda: engine.sparql(lubm7, decode=False).count())

    # opt-in extension surfaces at bench scale: a grouped aggregate over the
    # hot memberOf predicate (hash-aggregate on encoded ids, keys decoded
    # post-agg) and a sequence property path (o->s join of two edge sets)
    agg_q = (
        "PREFIX rdf:<rdf:> PREFIX ub:<ub:> "
        "SELECT ?d (COUNT(*) AS ?n) WHERE { ?x ub:memberOf ?d } GROUP BY ?d"
    )
    record("bgp_sparql_agg_members", lambda: engine.sparql(agg_q, aggregates=True).count())
    seq_q = (
        "PREFIX ub:<ub:> SELECT ?x ?u WHERE "
        "{ ?x ub:memberOf/ub:subOrganizationOf ?u }"
    )
    record("bgp_sparql_path_seq", lambda: engine.sparql(seq_q, decode=False, paths=True).count())

    # WatDiv template families (the baseline metric names "LUBM/WatDiv-style
    # join wall-time"): S = star (one hub, 4 satellites), F = snowflake (two
    # linked hubs with satellites), C = complex (triangle + chain + attribute
    # satellites, 8 patterns — stresses the DP lattice). L (linear) is
    # covered by bgp_chain_member/path_seq above.
    watdiv = {
        "bgp_watdiv_s": (
            "PREFIX rdf:<rdf:> PREFIX ub:<ub:> SELECT ?p ?n ?e ?t ?d WHERE "
            "{ ?p rdf:type ub:FullProfessor . ?p ub:name ?n . "
            "?p ub:emailAddress ?e . ?p ub:telephone ?t . ?p ub:worksFor ?d }"
        ),
        "bgp_watdiv_f": (
            "PREFIX ub:<ub:> SELECT ?p ?c ?cn ?d ?u WHERE "
            "{ ?p ub:teacherOf ?c . ?c ub:name ?cn . ?p ub:worksFor ?d . "
            "?d ub:subOrganizationOf ?u . ?p ub:emailAddress ?e }"
        ),
        "bgp_watdiv_c": (
            "PREFIX rdf:<rdf:> PREFIX ub:<ub:> SELECT ?s ?p ?c ?d WHERE "
            "{ ?s ub:advisor ?p . ?s ub:takesCourse ?c . ?p ub:teacherOf ?c . "
            "?s rdf:type ub:UndergraduateStudent . ?p ub:name ?pn . "
            "?c ub:name ?cn . ?p ub:worksFor ?d . ?d ub:subOrganizationOf ?u }"
        ),
    }
    for wname, wq in watdiv.items():
        record(wname, lambda wq=wq: engine.sparql(wq, decode=False).count())

    if cleanup:
        shutil.rmtree(out_dir, ignore_errors=True)

    # --- bgp_large: the BGP suite on a graph big enough to measure plans --
    # At sf0.1-scale graphs every BGP query sits at the 0.3-0.7s job-overhead
    # floor, so plan differences (DP order, bucketed vs partitioned layout,
    # T2/T3 effects) are invisible. 150k departments = ~1.9M docs / ~8.4M
    # triples puts queries above the floor. Both engine modes are timed:
    # "partitioned" (p-partitioned parquet + broadcast) and "bucketed"
    # (p-partitioned AND s/o-bucketed tables, broadcast disabled to force
    # the shuffle-free sort-merge path — the 100 TB join shape).
    # BENCH_LARGE_DEPTS=0 skips the section.
    large_depts = int(os.environ.get("BENCH_LARGE_DEPTS", "150000"))
    bgp_large = None
    if large_depts > 0:
        # drop every cache the suite sections left behind (persisted
        # shingles, planted-dup unions, ...): the large construct must not
        # fight them for executor memory
        spark.catalog.clearCache()
        ldocs, _ = gen_corpus(spark, n_depts=large_depts, seed=42, num_partitions=64)
        ldocs = ldocs.cache()
        n_ldocs = ldocs.count()
        # best-of-N (default 2): single multi-minute runs on this shared VM
        # carry +-50% scheduler/GC noise; best-of matches the scaling
        # script's protocol and the reference's drop-worst intent
        # clamped to >=1: 0 would leave construct_runs empty (min() raises)
        # — use BENCH_LARGE_DEPTS=0 to skip the whole section instead
        c_reps = max(1, int(os.environ.get("BENCH_LARGE_CONSTRUCT_REPS", "2")))
        construct_runs = []
        lstore = None
        ldir = None
        for _ in range(c_reps):
            if ldir is not None:
                shutil.rmtree(ldir, ignore_errors=True)
            ldir = tempfile.mkdtemp(prefix="bench_kg_large_")
            t0 = time.time()
            lstore = run_pipeline(spark, ldocs, ldir, resume=False, analyze=False)
            n_ltriples = lstore.spo().count()
            construct_runs.append(round(time.time() - t0, 3))
        t_lconstruct = min(construct_runs)
        ldocs.unpersist()
        t0 = time.time()
        analyze_graph(lstore, resume=False)
        t_lanalyze = time.time() - t0

        # r5 plan shapes at scale: a constant-equality FILTER over a hot
        # 2-hop join (id-lowered — the constant resolves to its dictionary
        # id and prunes on longs before any decode join) and a { SELECT }
        # aggregate subquery (shared var re-encoded to ids at the boundary,
        # enclosing join on longs)
        filter_q = (
            "PREFIX ub:<ub:> SELECT ?x ?d WHERE "
            "{ ?x ub:memberOf ?d . ?d ub:subOrganizationOf ?u . "
            '  FILTER(?u = "ub:University_7") }'
        )
        subq_q = (
            "PREFIX ub:<ub:> SELECT ?d ?n WHERE "
            "{ ?d ub:subOrganizationOf ?u . "
            "  { SELECT ?d (COUNT(*) AS ?n) WHERE { ?x ub:memberOf ?d } "
            "    GROUP BY ?d } }"
        )
        optfilter_q = (
            "PREFIX ub:<ub:> SELECT ?x ?m WHERE "
            "{ ?x ub:memberOf ?d . "
            '  OPTIONAL { ?x ub:emailAddress ?m FILTER(?m != "x@y.z") } }'
        )

        def _suite(eng):
            avgs, spreads = {}, {}
            for name, q in BGP_QUERIES.items():
                pats = parse_bgp(q)
                kept = _timed_reps(lambda: eng.count(pats), reps)
                avgs[name] = round(sum(kept) / len(kept), 3)
                spreads[name] = [round(min(kept), 3), round(max(kept), 3)]
            for nm, fn in (
                ("bgp_sparql_lubm7", lambda: eng.sparql(lubm7, decode=False).count()),
                ("bgp_sparql_agg_members",
                 lambda: eng.sparql(agg_q, aggregates=True).count()),
                ("bgp_sparql_path_seq",
                 lambda: eng.sparql(seq_q, decode=False, paths=True).count()),
                ("bgp_sparql_filter_const",
                 lambda: eng.sparql(filter_q, filters=True).count()),
                ("bgp_sparql_subquery_agg",
                 lambda: eng.sparql(
                     subq_q, subquery=True, aggregates=True
                 ).count()),
                ("bgp_sparql_optfilter",
                 lambda: eng.sparql(optfilter_q, filters=True).count()),
                *(
                    (wname, lambda wq=wq: eng.sparql(wq, decode=False).count())
                    for wname, wq in watdiv.items()
                ),
            ):
                kept = _timed_reps(fn, reps)
                avgs[nm] = round(sum(kept) / len(kept), 3)
                spreads[nm] = [round(min(kept), 3), round(max(kept), 3)]
            return avgs, spreads

        # the pipeline builds the bucketed layout as part of construct now
        # (reference: indexes always built at load), so construct_sec above
        # INCLUDES the bucketize cost and the default engine is the bucketed
        # one; the p-partitioned engine is kept as the A/B comparison arm
        # (same broadcast policy — only the big-big joins differ: bucketed
        # SMJ with no exchange, the comparison that matters at 100 TB)
        part_avgs, part_spread = _suite(BGPEngine(lstore, bucketed_prefix=None))
        buck_eng = BGPEngine(lstore)
        buck_avgs, buck_spread = _suite(buck_eng)

        # plan audit AT THIS SCALE (VERDICT r3 task 1: plan evidence at
        # bgp_large, where the statistics — and therefore the DP order and
        # broadcast gating — differ from the tiny pytest fixtures): node
        # counts from the formatted physical plan of the two queries whose
        # plans regressed in r3. No exchange on the big sides = the join
        # keys ride the bucket layout end to end.
        def _plan_nodes(df, extra: dict | None = None):
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = {
                "sort_merge_join": plan.count("SortMergeJoin") // 2,
                "broadcast_hash_join": plan.count("BroadcastHashJoin") // 2,
                "exchange_hashpartitioning": plan.count(
                    "Exchange hashpartitioning"
                ) // 2,
            }
            for key, needle in (extra or {}).items():
                out[key] = plan.count(needle)
            return out

        plan_audit = {
            "lubm7": _plan_nodes(buck_eng.sparql(lubm7, decode=False)),
            "chain_member": _plan_nodes(
                buck_eng.query(parse_bgp(BGP_QUERIES["bgp_chain_member"]), decode=False)
            ),
            # r5 lowering shapes AT THIS SCALE: the constant FILTER must
            # reach the scan as a pushed long-equality (the dict-resolved
            # id), counted via the pushed-filter marker; the subquery plan
            # carries a CONSTANT number of dict scans (3: subquery output
            # decode, boundary re-encode, final projection decode — one
            # per referenced var, never one per solution column), and its
            # enclosing join keys stay long (asserted per-key in
            # tests/test_plans.py::test_subquery_boundary_joins_on_ids)
            "filter_const": _plan_nodes(
                buck_eng.sparql(filter_q, filters=True),
                {"pushed_equalto": "EqualTo(o,"},
            ),
            "subquery_agg": _plan_nodes(
                buck_eng.sparql(subq_q, subquery=True, aggregates=True),
                {"dict_scans": "dict_stage"},
            ),
            # OPTIONAL-scoped FILTER (r5): the id-lowerable block filter
            # prunes the block frame on longs, so the only dict scans are
            # the projection's output decode — never one below the left
            # join (asserted structurally in tests/test_plans.py::
            # test_optional_scoped_filter_stays_encoded)
            "optional_filter": _plan_nodes(
                buck_eng.sparql(optfilter_q, filters=True),
                {"dict_scans": "dict_stage"},
            ),
        }
        # the same two plans in the true-100TB regime, where no side fits a
        # broadcast (auto threshold off, engine gate off): every join must
        # ride the bucket layout — SMJ with exchanges ONLY where the join
        # key leaves the bucket column, never on the leaf scans
        prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            smj_eng = BGPEngine(lstore, broadcast_rows=0)
            plan_audit["lubm7_smj_forced"] = _plan_nodes(
                smj_eng.sparql(lubm7, decode=False)
            )
            plan_audit["chain_member_smj_forced"] = _plan_nodes(
                smj_eng.query(parse_bgp(BGP_QUERIES["bgp_chain_member"]), decode=False)
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        # PageRank over the big graph's structural edges (encoded ids as
        # node labels — no decode needed to rank): the iterative-workload
        # measurement where real shuffle work dominates the per-iteration
        # scheduling floor that rules at sf0.1 (15k nodes ~6s of overhead;
        # here the rank vector is ~1.9M nodes over ~2.1M edges)
        from parj_spark.operators.graphalg import pagerank
        from pyspark.sql import functions as SF

        struct_pids = [
            int(r["id"])
            for r in lstore.properties()
            .filter(SF.col("uri").isin("ub:memberOf", "ub:subOrganizationOf"))
            .collect()
        ]
        ledges = lstore.pos().filter(SF.col("p").isin(struct_pids)).select(
            SF.col("s").alias("src"), SF.col("o").alias("dst")
        )
        pr_runs = _timed_reps(
            lambda: pagerank(ledges, n_iter=5).count(), min(reps, 3)
        )
        t_pagerank = round(sum(pr_runs) / len(pr_runs), 3)

        # RDFS entailment materialization at scale (reason.py): the closure
        # is value-generic, so it runs over the ENCODED graph — the 8.35M
        # triples never decode, schema-predicate probes prune to zero spo
        # partitions, and rdfs2/3 scans are predicate-pruned. LUBM-flavored
        # TBox: worksFor ⊑ memberOf ⊑ affiliatedWith*, Grad/UG-Student ⊑
        # Student* ⊑ Person*, FullProfessor ⊑ Faculty*, teacherOf
        # domain Faculty* / range Course (* = new terms, negative ids like
        # the streaming path's reserved range).
        from parj_spark.construct.reason import rdfs_closure

        prop_ids = {
            r["uri"]: int(r["id"]) for r in lstore.properties().collect()
        }
        cls_uris = [
            "ub:GraduateStudent", "ub:UndergraduateStudent",
            "ub:FullProfessor", "ub:Course",
        ]
        cls_ids = {
            r["uri"]: int(r["id"])
            for r in lstore.dict().filter(SF.col("uri").isin(cls_uris)).collect()
        }
        T_SC, T_SP, T_DOM, T_RNG = -101, -102, -103, -104
        AFFIL, STUDENT, PERSON, FACULTY = -1, -2, -3, -4
        tbox_rows = [
            (prop_ids["ub:worksFor"], T_SP, prop_ids["ub:memberOf"]),
            (prop_ids["ub:memberOf"], T_SP, AFFIL),
            (cls_ids["ub:GraduateStudent"], T_SC, STUDENT),
            (cls_ids["ub:UndergraduateStudent"], T_SC, STUDENT),
            (STUDENT, T_SC, PERSON),
            (cls_ids["ub:FullProfessor"], T_SC, FACULTY),
            (prop_ids["ub:teacherOf"], T_DOM, FACULTY),
            (prop_ids["ub:teacherOf"], T_RNG, cls_ids["ub:Course"]),
        ]
        base_enc = lstore.spo().select("s", "p", "o").union(
            spark.createDataFrame(tbox_rows, "s long, p long, o long")
        )
        ent_counts: list[int] = []
        ent_runs = _timed_reps(
            lambda: ent_counts.append(
                rdfs_closure(
                    base_enc,
                    type_pred=prop_ids["rdf:type"],
                    subclass_pred=T_SC,
                    subprop_pred=T_SP,
                    domain_pred=T_DOM,
                    range_pred=T_RNG,
                ).count()
            ),
            min(reps, 3),
        )
        t_entail = round(sum(ent_runs) / len(ent_runs), 3)
        n_entailed = ent_counts[-1]

        # sameAs smushing throughput at graph scale: fold_sameas is
        # value-generic, so it runs straight on the ENCODED graph with the
        # ub:advisor slice standing in as the equivalence relation (a
        # ~large-fraction-of-students edge set — a far denser merge than
        # real alias clusters, i.e. a conservative upper bound on cost:
        # union-find over the slice + two-sided rewrite + distinct)
        from parj_spark.construct.canonicalize import fold_sameas

        fold_counts: list[int] = []
        fold_runs = _timed_reps(
            lambda: fold_counts.append(
                fold_sameas(
                    lstore.spo().select("s", "p", "o"),
                    pred=prop_ids["ub:advisor"],
                ).count()
            ),
            min(reps, 3),
        )
        t_fold = round(sum(fold_runs) / len(fold_runs), 3)

        bgp_large = {
            "n_depts": large_depts,
            "n_docs": n_ldocs,
            "n_triples": n_ltriples,
            "construct_sec": round(t_lconstruct, 3),
            "construct_runs": construct_runs,
            "analyze_sec": round(t_lanalyze, 3),
            "docs_per_sec": round(n_ldocs / t_lconstruct, 1),
            "triples_per_sec": round(n_ltriples / t_lconstruct, 1),
            "construct_includes_bucketize": True,
            "partitioned": part_avgs,
            "partitioned_spread": part_spread,
            "bucketed": buck_avgs,
            "bucketed_spread": buck_spread,
            "plan_audit": plan_audit,
            "pagerank_5iter_sec": t_pagerank,
            "pagerank_runs": [round(x, 3) for x in pr_runs],
            "rdfs_entail_sec": t_entail,
            "rdfs_entail_runs": [round(x, 3) for x in ent_runs],
            "rdfs_entailed_triples": n_entailed,
            "rdfs_derived_triples": n_entailed - n_ltriples - len(tbox_rows),
            "rdfs_entail_triples_per_sec": round(n_ltriples / t_entail, 1),
            "sameas_fold_sec": t_fold,
            "sameas_fold_runs": [round(x, 3) for x in fold_runs],
            "sameas_folded_triples": fold_counts[-1],
            "sameas_fold_triples_per_sec": round(n_ltriples / t_fold, 1),
        }
        shutil.rmtree(ldir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    query_avgs = [v for k, v in timings.items() if k not in ("kg_construct", "kg_analyze")]
    geomean = round(
        math.exp(sum(math.log(max(v, 1e-6)) for v in query_avgs) / len(query_avgs)), 4
    )
    summary = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "geomean_sec": geomean,
        "protocol": {"reps": reps, "drop_first": reps > 1, "construct_reps": 1},
        "sf": sf,
        "cpus": cpus,
        "kg_docs": n_docs,
        "kg_triples": n_triples,
        "docs_per_sec": round(n_docs / t_construct, 1),
        "triples_per_sec": round(n_triples / t_construct, 1),
    }
    if bgp_large is not None:
        # compact view for the one-line artifact: scalars + per-layout
        # geomeans; the per-query maps and spreads go to the detail file
        def _geo(d):
            vals = [v for v in d.values() if v > 0]
            return round(math.exp(sum(math.log(v) for v in vals) / len(vals)), 4)

        summary["bgp_large"] = {
            k: v for k, v in bgp_large.items()
            if not isinstance(v, dict) and not k.endswith("_spread")
            and k != "construct_runs"
        }
        for layout in ("partitioned", "bucketed"):
            if isinstance(bgp_large.get(layout), dict):
                summary["bgp_large"][f"{layout}_geomean_sec"] = _geo(
                    bgp_large[layout]
                )
    # Full detail (per-query min/max spreads, large-graph construct runs)
    # outgrew the driver's one-line tail capture in round 3 (BENCH_r03.json
    # "parsed": null) — it now lands in a committed file instead, and the
    # printed line stays compact enough to survive the capture.
    detail = dict(summary, spread=spread, bgp_large=bgp_large)
    # BENCH_DETAIL_PATH: redirect the detail artifact. Without it, only the
    # canonical per-round scale (sf0.1) lands in last_run.json; smoke runs at
    # other scales get an sf-suffixed file so they cannot clobber the
    # committed full-run record (which round 4's verify smoke once did).
    default_name = "last_run.json" if sf == "0.1" else f"last_run_sf{sf}.json"
    detail_path = os.environ.get("BENCH_DETAIL_PATH") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", default_name
    )
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    summary["detail"] = os.path.relpath(detail_path, os.path.dirname(os.path.abspath(__file__)))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
