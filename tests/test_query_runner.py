"""Tests for scripts/submit_query.py — the QueryTester.java analog CLI.

The subprocess path (spark-submit) would spin a second JVM; these tests
exercise the module's functions in-process against the session fixtures.
"""

import importlib.util
import os

import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "submit_query.py",
)

PREFIXES = "PREFIX rdf:<rdf:> PREFIX ub:<ub:> "
Q_DEPTS = PREFIXES + "SELECT ?x WHERE { ?x rdf:type ub:Department }"


@pytest.fixture(scope="module")
def runner():
    spec = importlib.util.spec_from_file_location("submit_query", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def engine(tiny_graph):
    from parj_spark.query.bgp import BGPEngine

    return BGPEngine(tiny_graph)


def test_read_query_file_ignores_short_lines(runner, tmp_path):
    # QueryTester.java:161 — "Lines with less than 30 characters will be
    # ignored"; blank lines and comments under the threshold drop out too
    p = tmp_path / "queries.txt"
    p.write_text(f"# lubm\n\nshort line\n{Q_DEPTS}\n")
    assert runner.read_query_file(str(p)) == [Q_DEPTS]


def test_run_one_times_and_counts(runner, engine):
    s = runner.run_one(
        engine,
        Q_DEPTS,
        decode=True,
        strict=True,
        reps=2,
        print_results=False,
        limit=0,
    )
    assert s["rows"] == 8  # tiny_corpus has 8 departments
    assert s["reps"] == 2
    assert 0 < s["ms_min"] <= s["ms_avg"] <= s["ms_max"]


def test_strict_mode_rejects_extensions(runner, engine):
    # reference parity: DagCreator.java:170-171 rejects FILTER
    q = (
        PREFIXES
        + 'SELECT ?x ?n WHERE { ?x ub:name ?n . FILTER(?n != "nobody") }'
    )
    with pytest.raises(ValueError):
        runner.run_one(
            engine, q, decode=True, strict=True, reps=1,
            print_results=False, limit=0,
        )
    # default mode accepts it
    s = runner.run_one(
        engine, q, decode=True, strict=False, reps=1,
        print_results=False, limit=0,
    )
    assert s["rows"] > 0


def test_print_results_limit(runner, engine, capsys):
    s = runner.run_one(
        engine,
        Q_DEPTS,
        decode=True,
        strict=True,
        reps=1,
        print_results=True,
        limit=3,
    )
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if ln]
    assert s["rows"] == 8
    assert len(lines) == 4  # 3 rows + "... (5 more rows)"
    assert lines[-1] == "... (5 more rows)"


def test_run_update_live_view_and_strict_rejection(runner, tiny_graph, tmp_path):
    """--update applies merge-on-read deltas (base untouched), live_store
    then serves the merged view; --strict rejects updates entirely (the
    reference stores are read-only, parj.c:599, 1129)."""
    import os

    spark = tiny_graph.spark
    stream_dir = str(tmp_path / "updates")
    text = PREFIXES + "INSERT DATA { <ub:CLI_X> <ub:cliPred> <ub:CLI_Y> }"

    with pytest.raises(ValueError, match="read-only"):
        runner.run_update(tiny_graph, stream_dir, text,
                          strict=True, compact=False)
    assert not os.path.exists(stream_dir)  # rejection wrote nothing

    n_base = tiny_graph.spo().count()
    s = runner.run_update(tiny_graph, stream_dir, text,
                          strict=False, compact=False)
    assert s["live_triples"] == n_base + 1 and not s["compacted"]
    assert tiny_graph.spo().count() == n_base  # base layout untouched

    # query mode now picks the merged view automatically...
    live = runner.live_store(spark, tiny_graph.out_dir, stream_dir)
    assert getattr(live, "stream_dir", None) == stream_dir
    from parj_spark.query.bgp import BGPEngine

    assert BGPEngine(live).count("?s ub:cliPred ?o") == 1
    # ...and the plain base store where no deltas exist
    plain = runner.live_store(spark, tiny_graph.out_dir, str(tmp_path / "none"))
    assert getattr(plain, "stream_dir", None) is None


def test_nquads_mode_serves_graph_queries(runner, spark, tmp_path):
    """--nquads path: QuadsEngine answers GRAPH queries straight off an
    N-Quads file through the same run_one timing loop."""
    p = tmp_path / "data.nq"
    p.write_text(
        "<urn:a> <urn:knows> <urn:b> <urn:g1> .\n"
        "<urn:b> <urn:knows> <urn:c> <urn:g2> .\n"
        "<urn:c> <urn:name> \"Sea\" .\n"
    )
    from parj_spark.construct.rdf_io import read_nquads

    quads = read_nquads(spark, str(p)).withColumnsRenamed(
        {"s_uri": "s", "p_uri": "p", "o_uri": "o", "g_uri": "g"}
    )
    eng = runner.QuadsEngine(quads)
    s = runner.run_one(
        eng,
        "SELECT ?g ?x WHERE { GRAPH ?g { ?x <urn:knows> ?y } }",
        decode=True, strict=False, reps=1, print_results=False, limit=0,
    )
    assert s["rows"] == 2
    # default graph: only the un-labelled statement
    s2 = runner.run_one(
        eng, "SELECT ?x WHERE { ?x <urn:name> ?n }",
        decode=True, strict=False, reps=1, print_results=False, limit=0,
    )
    assert s2["rows"] == 1


def test_demo_lifecycle(spark, tmp_path):
    """scripts/demo_lifecycle.py end to end: construct -> query -> update ->
    compaction -> export/re-import round trip (post-compaction export must
    include the updated triple — the stale-triples_uri regression) ->
    GRAPH + SERVICE over N-Quads."""
    import importlib.util

    path = os.path.join(os.path.dirname(SCRIPT), "demo_lifecycle.py")
    spec = importlib.util.spec_from_file_location("demo_lifecycle", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.run(spark, str(tmp_path))
    assert out["reimported"] == out["triples"] + 1
    assert out["federated"] == [("urn:b", "Sea")]
