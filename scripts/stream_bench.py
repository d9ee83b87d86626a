"""Merge-on-read penalty vs compaction payback at bgp_large scale.

VERDICT r4 task #6: ``StreamedGraphStore`` disables the bucketed layout
while stream deltas exist (the delta tail is not bucketed, so the union is
not bucket-aligned), and every query additionally pays the unpruned tail
scan + union. ``maybe_compact`` folds the deltas back in when
``delta_ratio`` exceeds ``max_ratio`` (default 0.10) — this script measures
the cost curve that default sits on:

  1. build a base graph at bgp_large scale (150k departments by default);
  2. stream-append document deltas (the real ``incremental_graph_append``
     path: extract -> canonicalize-against-base -> encode -> epoch write)
     up to a ladder of delta ratios;
  3. at each rung, time the bgp_large BGP suite over the live
     ``StreamedGraphStore`` (merge-on-read);
  4. compact (timed), then time the same suite over the folded graph
     (bucketed default path) — the payback side.

The corpus is generated ONCE at base+max-delta departments so base and
delta documents share one consistent entity universe (dept index is encoded
in doc_id), then split by department index: the base pipeline sees
departments [0, base) and each append step feeds the next index range.

Output: one JSON blob on stdout + BENCH/STREAM_MERGE_ON_READ.json.
Protocol: reps timed per query with the first dropped (warm-up), average
of kept reported — the same drop-worst intent as bench.py/scaling.py.

Usage:
    python scripts/stream_bench.py [--base-depts 150000] \
        [--ratios 0.02,0.05,0.10,0.20] [--reps 3] [--cpus 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

LUBM7 = (
    "PREFIX rdf:<rdf:> PREFIX ub:<ub:> "
    "SELECT ?x ?y ?z WHERE { ?y ub:teacherOf ?z . "
    "?y rdf:type ub:FullProfessor . ?z rdf:type ub:Course . "
    "?x ub:advisor ?y . ?x rdf:type ub:UndergraduateStudent . "
    "?x ub:takesCourse ?z }"
)


def _timed(fn, reps: int) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    return out[1:] if len(out) > 1 else out


def run_suite(engine, reps: int) -> dict[str, float]:
    """bench.py's bgp_large BGP suite (programmatic BGPs + LUBM7 SPARQL)."""
    from bench import BGP_QUERIES
    from parj_spark.query.bgp import parse_bgp

    res = {}
    for name, q in BGP_QUERIES.items():
        pats = parse_bgp(q)
        kept = _timed(lambda: engine.count(pats), reps)
        res[name] = round(sum(kept) / len(kept), 3)
    kept = _timed(lambda: engine.sparql(LUBM7, decode=False).count(), reps)
    res["bgp_sparql_lubm7"] = round(sum(kept) / len(kept), 3)
    return res


def geomean(d: dict[str, float]) -> float:
    vals = [v for v in d.values() if v > 0]
    return round(math.exp(sum(math.log(v) for v in vals) / len(vals)), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-depts", type=int, default=150_000)
    ap.add_argument("--ratios", default="0.02,0.05,0.10,0.20")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="BENCH/STREAM_MERGE_ON_READ.json")
    args = ap.parse_args()
    ratios = [float(r) for r in args.ratios.split(",")]

    from parj_spark import streaming
    from parj_spark.construct.pipeline import GraphStore, run_pipeline
    from parj_spark.fixtures import gen_corpus
    from parj_spark.query import BGPEngine
    from parj_spark.session import get_spark

    spark = get_spark(app="stream_bench", cpus=args.cpus, shuffle_partitions=64)
    base_depts = args.base_depts
    total_depts = int(math.ceil(base_depts * (1 + max(ratios))))

    work = tempfile.mkdtemp(prefix="stream_bench_")
    out_dir = os.path.join(work, "graph")
    stream_dir = os.path.join(work, "stream")
    in_dir = os.path.join(work, "in")
    ck_dir = os.path.join(work, "ck")
    os.makedirs(in_dir)

    # one consistent universe; dept index g is the doc_id's middle field
    all_docs, _ = gen_corpus(spark, n_depts=total_depts, seed=42, num_partitions=64)
    dept_idx = F.split("doc_id", "_").getItem(1).cast("long")
    base_docs = all_docs.filter(dept_idx < base_depts)

    results: dict = {"base_depts": base_depts, "ratios": ratios, "reps": args.reps}

    t0 = time.time()
    store = run_pipeline(spark, base_docs, out_dir, resume=False)
    n_base = store.spo().count()
    results["base_construct_sec"] = round(time.time() - t0, 3)
    results["base_triples"] = n_base

    # reference point: the bucketed default over the pristine base
    results["suite_base_bucketed"] = run_suite(BGPEngine(store), args.reps)

    # --- delta ladder -----------------------------------------------------
    q = streaming.incremental_graph_append(
        streaming.read_docs_stream(spark, in_dir, max_files=512),
        store,
        stream_dir,
        ck_dir,
    )
    steps = []
    done_dept = base_depts
    for target in ratios:
        upto = int(math.ceil(base_depts * (1 + target)))
        step_docs = all_docs.filter((dept_idx >= done_dept) & (dept_idx < upto))
        # drop the step's docs into the monitored dir as uniquely-named files
        tmp = os.path.join(work, f"step_{target}")
        step_docs.coalesce(8).write.mode("overwrite").parquet(tmp)
        for j, f_ in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f_, os.path.join(in_dir, f"d{done_dept}_{j}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
        done_dept = upto

        t0 = time.time()
        sq = q.trigger(availableNow=True).start()
        sq.awaitTermination()
        t_append = round(time.time() - t0, 3)

        live = streaming.StreamedGraphStore(spark, out_dir, stream_dir)
        ratio = round(streaming.delta_ratio(live, stream_dir), 4)
        t0 = time.time()
        suite = run_suite(BGPEngine(live), args.reps)
        steps.append(
            {
                "target_ratio": target,
                "measured_ratio": ratio,
                "append_sec": t_append,
                "suite_live": suite,
                "suite_live_geomean": geomean(suite),
            }
        )
        print(json.dumps(steps[-1]), flush=True)
    results["steps"] = steps

    # --- compaction payback -----------------------------------------------
    t0 = time.time()
    folded = streaming.compact_stream(store, stream_dir)
    results["compact_sec"] = round(time.time() - t0, 3)
    results["folded_triples"] = folded.spo().count()
    suite = run_suite(BGPEngine(folded), args.reps)
    results["suite_folded_bucketed"] = suite
    results["suite_folded_geomean"] = geomean(suite)
    results["suite_base_geomean"] = geomean(results["suite_base_bucketed"])

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
