#!/usr/bin/env python
"""One scaling measurement at local[$SPARK_GRAFT_CPUS]: the KG construction
pipeline plus compute-dense operators, each repeated $SCALE_REPS times
(first run of everything is warm-up, per the reference's protocol —
/root/reference/README.md:66). Prints one JSON line with per-rep walls.
Run by scripts/scaling.py at two parallelism levels."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parj_spark.session import get_spark  # noqa: E402
from parj_spark.fixtures import gen_corpus  # noqa: E402
from parj_spark.construct import run_pipeline  # noqa: E402
from parj_spark.construct.pipeline import analyze_graph  # noqa: E402
from parj_spark.operators import dedup  # noqa: E402
from parj_spark.query import BGPEngine, parse_bgp  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_depts = int(os.environ.get("SCALE_DEPTS", "60000"))
    reps = int(os.environ.get("SCALE_REPS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # identical shuffle partitioning at both levels: isolates task-slot count
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "64")
    spark = get_spark(app=f"scaling_{cpus}", cpus=cpus)

    runs: dict[str, list[float]] = {
        "kg_construct": [], "kg_analyze": [], "neardup_cosine": [], "bgp_suite": []
    }

    # corpus (identical layout at both levels), materialized untimed
    docs, _ = gen_corpus(spark, n_depts=n_depts, seed=42, num_partitions=64)
    docs = docs.cache()
    n_docs = docs.count()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    big = emb
    for i in range(1, 4):
        big = big.union(
            emb.select((F.col("vec_id") + 5000 * i).alias("vec_id"), "embedding", "label")
        )
    big = big.cache()
    n_vecs = big.count()

    # warm-up pass (discarded): small pipeline + small cosine
    warm_dir = tempfile.mkdtemp(prefix=f"warm_{cpus}_")
    wdocs, _ = gen_corpus(spark, n_depts=100, seed=42, num_partitions=8)
    run_pipeline(spark, wdocs, warm_dir, resume=False)
    shutil.rmtree(warm_dir, ignore_errors=True)
    dedup.embedding_neardup_pairs(emb.limit(300), threshold=0.99).count()

    n_triples = 0
    for _rep in range(reps):
        out_dir = tempfile.mkdtemp(prefix=f"scale_{cpus}_")
        t0 = time.time()
        store = run_pipeline(spark, docs, out_dir, resume=False, analyze=False)
        n_triples = store.spo().count()
        runs["kg_construct"].append(round(time.time() - t0, 3))

        # optimizer-statistics pass, timed apart (reference phase split:
        # load wall-time vs SPARQLAnalyzer's histograms.json build)
        t0 = time.time()
        analyze_graph(store, resume=False)
        runs["kg_analyze"].append(round(time.time() - t0, 3))

        engine = BGPEngine(store)
        t0 = time.time()
        engine.count(
            parse_bgp("?s ub:advisor ?p . ?s ub:takesCourse ?c . ?p ub:teacherOf ?c .")
        )
        engine.count(
            parse_bgp("?x rdf:type ub:FullProfessor . ?x ub:worksFor ?d . ?x ub:name ?n .")
        )
        runs["bgp_suite"].append(round(time.time() - t0, 3))
        shutil.rmtree(out_dir, ignore_errors=True)

        t0 = time.time()
        dedup.embedding_neardup_pairs(big, threshold=0.99).count()
        runs["neardup_cosine"].append(round(time.time() - t0, 3))

    best = {k: min(v) for k, v in runs.items()}
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_depts": n_depts,
                "n_docs": n_docs,
                "n_vecs": n_vecs,
                "n_triples": n_triples,
                "total_sec": round(sum(best.values()), 3),
                "docs_per_sec": round(n_docs / best["kg_construct"], 1),
                "triples_per_sec": round(n_triples / best["kg_construct"], 1),
                "pairs_per_sec": round(n_vecs * (n_vecs - 1) / 2 / best["neardup_cosine"], 0),
                "stages": best,
                "all_runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
