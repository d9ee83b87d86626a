#!/usr/bin/env python
"""End-to-end lifecycle demo: everything a reference (PARJ) user does,
plus the extension surface, in one runnable script.

    corpus -> construct -> BGP + SPARQL query -> SPARQL 1.1 Update
    (merge-on-read) -> compaction -> N-Triples export -> re-import ->
    named-graph (N-Quads) querying with GRAPH / SERVICE

Each stage asserts its output, so the script doubles as an integration
check (tests/test_query_runner.py::test_demo_lifecycle runs it
in-process). Run standalone:

    python scripts/demo_lifecycle.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, workdir: str) -> dict:
    """Run the lifecycle under ``workdir``; returns per-stage evidence."""
    from parj_spark.construct.pipeline import GraphStore, import_rdf, run_pipeline
    from parj_spark.construct.rdf_io import read_nquads
    from parj_spark.fixtures import gen_corpus
    from parj_spark.query.bgp import BGPEngine
    from parj_spark.query.sparql import execute_on_quads
    from parj_spark.query.update import apply_update
    from parj_spark.streaming import compact_stream

    out: dict = {}

    # 1. construct: interleaved docs -> canonical triples -> permutation +
    #    bucketed layout + statistics (the reference's load+analyze)
    docs, _ = gen_corpus(spark, n_depts=3, seed=7)
    graph_dir = os.path.join(workdir, "graph")
    store = run_pipeline(spark, docs, graph_dir)
    out["triples"] = store.spo().count()
    assert out["triples"] > 0

    # 2. query: hand-built BGP and the SPARQL text front-end agree
    eng = BGPEngine(store)
    q = ("PREFIX rdf:<rdf:> PREFIX ub:<ub:> "
         "SELECT ?x WHERE { ?x rdf:type ub:Department }")
    out["departments"] = eng.sparql(q).count()
    assert out["departments"] == 3  # n_depts departments in the corpus

    # 3. update: merge-on-read insert, visible live, then compacted away
    stream_dir = os.path.join(graph_dir, "_updates")
    probe = ("PREFIX ub:<ub:> "
             "SELECT ?o WHERE { <ub:demo> <ub:addedBy> ?o }")
    live = apply_update(
        store, stream_dir,
        'PREFIX ub:<ub:> INSERT DATA { <ub:demo> <ub:addedBy> "lifecycle" }',
    )
    assert BGPEngine(live).sparql(probe).count() == 1
    compact_stream(GraphStore(spark, graph_dir), stream_dir)
    store = GraphStore(spark, graph_dir)
    out["post_compact"] = BGPEngine(store).sparql(probe).count()
    assert out["post_compact"] == 1  # folded into the base layout

    # 4. round trip: export N-Triples, re-import, same graph
    nt_dir = os.path.join(workdir, "export_nt")
    store.export_ntriples(nt_dir)
    re_dir = os.path.join(workdir, "reimport")
    store2 = import_rdf(spark, nt_dir, re_dir)
    out["reimported"] = store2.spo().count()
    assert out["reimported"] == out["triples"] + 1  # + the update's triple

    # 5. named graphs: an N-Quads dataset queried with GRAPH + SERVICE
    nq = os.path.join(workdir, "data.nq")
    with open(nq, "w") as f:
        f.write('<urn:a> <urn:knows> <urn:b> <urn:g:crm> .\n'
                '<urn:b> <urn:knows> <urn:c> <urn:g:hr> .\n'
                '<urn:c> <urn:name> "Sea" .\n')
    quads = read_nquads(spark, nq).withColumnsRenamed(
        {"s_uri": "s", "p_uri": "p", "o_uri": "o", "g_uri": "g"}
    )
    per_graph = execute_on_quads(
        quads, "SELECT ?g ?x WHERE { GRAPH ?g { ?x <urn:knows> ?y } }"
    )
    out["graph_rows"] = per_graph.count()
    assert out["graph_rows"] == 2
    fed = execute_on_quads(
        quads,
        "SELECT ?x ?n WHERE { GRAPH <urn:g:hr> { ?x <urn:knows> ?y } . "
        "SERVICE <urn:svc:names> { ?y <urn:name> ?n } }",
        allow_service=True,
        services={"urn:svc:names": quads.select("s", "p", "o")},
    )
    out["federated"] = [tuple(r) for r in fed.collect()]
    assert out["federated"] == [("urn:b", "Sea")]
    return out


def main() -> None:
    from parj_spark.session import get_spark

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="parj_demo_"
    )
    spark = get_spark(app="parj_spark_demo", cpus=8, shuffle_partitions=8)
    evidence = run(spark, workdir)
    for stage, value in evidence.items():
        print(f"  {stage}: {value}")
    print(f"lifecycle OK under {workdir}")


if __name__ == "__main__":
    main()
