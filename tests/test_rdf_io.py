"""N-Triples importer tests (reference S7 analog, ImportHandler.java:24-172):
line grammar, escape handling, parity blank-node rejection, and the
import_rdf end-to-end path into a query-ready GraphStore."""

import pytest

from parj_spark.construct.rdf_io import count_rejected, read_ntriples


NT = r"""# comment line

<urn:a> <urn:name> "Alpha" .
<urn:a> <urn:knows> <urn:b> .
<urn:b> <urn:name> "Be\"ta \\ with \n newline and \t tab" .
<urn:b> <urn:label> "tagged"@en .
<urn:b> <urn:size> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:blank <urn:name> "skipped subject" .
<urn:c> <urn:knows> _:blank .
<urn:c> <urn:name> "" .
this line is malformed
"""


@pytest.fixture(scope="module")
def nt_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("nt") / "data.nt"
    p.write_text(NT)
    return str(p)


def test_read_ntriples_grammar(spark, nt_path):
    rows = {
        (r["s_uri"], r["p_uri"], r["o_uri"])
        for r in read_ntriples(spark, nt_path).collect()
    }
    assert rows == {
        ("urn:a", "urn:name", "Alpha"),
        ("urn:a", "urn:knows", "urn:b"),
        # the four standard escapes unescaped, backslash-safe
        ("urn:b", "urn:name", 'Be"ta \\ with \n newline and \t tab'),
        # @lang and ^^datatype suffixes dropped (front-end canonical form)
        ("urn:b", "urn:label", "tagged"),
        ("urn:b", "urn:size", "42"),
        # empty literal is a valid object
        ("urn:c", "urn:name", ""),
    }
    # 2 blank-node lines (parity rejection) + 1 malformed line
    assert count_rejected(spark, nt_path) == 3


def test_import_rdf_end_to_end(spark, tmp_path):
    """import_rdf produces a GraphStore with the standard layout: the
    imported graph answers BGP and SPARQL queries like a pipeline-built
    one (S7: file -> encoded DB -> queries)."""
    from parj_spark.construct.pipeline import import_rdf
    from parj_spark.query import BGPEngine, Pattern

    nt = tmp_path / "g.nt"
    nt.write_text(
        "\n".join(
            [
                '<urn:n1> <urn:type> <urn:Nation> .',
                '<urn:n2> <urn:type> <urn:Nation> .',
                '<urn:n1> <urn:name> "One" .',
                '<urn:n2> <urn:name> "Two" .',
                '<urn:n1> <urn:next> <urn:n2> .',
            ]
        )
        + "\n"
    )
    store = import_rdf(spark, str(nt), str(tmp_path / "graph"))
    eng = BGPEngine(store)
    got = eng.query(
        [Pattern("?x", "urn:type", "urn:Nation"), Pattern("?x", "urn:name", "?n")],
        select=["x", "n"],
    )
    assert sorted(map(tuple, got.collect())) == [("urn:n1", "One"), ("urn:n2", "Two")]
    # SPARQL front-end + property path over the imported graph
    ask = eng.sparql(
        "ASK { <urn:n1> <urn:next>+ <urn:n2> }", ask=True, paths=True
    )
    assert [r["ask"] for r in ask.collect()] == [True]


def test_write_ntriples_round_trip(spark, nt_path, tmp_path):
    """Export is the importer's exact inverse: write what was read, read it
    back, and the triple sets are equal — escapes, empty literals, IRIs."""
    from parj_spark.construct.rdf_io import write_ntriples

    orig = read_ntriples(spark, nt_path)
    out = str(tmp_path / "export")
    write_ntriples(orig, out, partitions=1)
    back = {tuple(r) for r in read_ntriples(spark, out).collect()}
    assert back == {tuple(r) for r in orig.collect()}
    # nothing in the exported file is skipped on re-read
    assert count_rejected(spark, out) == 0


def test_write_ntriples_spo_columns_and_rejection(spark, tmp_path):
    """CONSTRUCT results carry (s, p, o) column names — accepted directly;
    anything else fails loudly."""
    from parj_spark.construct.rdf_io import write_ntriples

    df = spark.createDataFrame(
        [("urn:a", "urn:knows", "urn:b"), ("urn:a", "urn:name", "A says \"hi\"")],
        ["s", "p", "o"],
    )
    out = str(tmp_path / "spo")
    write_ntriples(df, out, partitions=1)
    back = {tuple(r) for r in read_ntriples(spark, out).collect()}
    assert back == {
        ("urn:a", "urn:knows", "urn:b"),
        ("urn:a", "urn:name", 'A says "hi"'),
    }
    with pytest.raises(ValueError):
        write_ntriples(df.toDF("x", "y", "z"), str(tmp_path / "bad"))


def test_graphstore_export_ntriples(spark, tiny_graph, tmp_path):
    """A pipeline-built GraphStore dumps to .nt and re-reads triple-exact."""
    out = str(tmp_path / "dump")
    tiny_graph.export_ntriples(out, partitions=1)
    back = read_ntriples(spark, out)
    assert back.count() == tiny_graph.triples_uri().count()
    assert count_rejected(spark, out) == 0


NQ = r"""# mixed N-Quads / N-Triples
<urn:a> <urn:name> "Alpha" <urn:graph1> .
<urn:a> <urn:knows> <urn:b> <urn:graph1> .
<urn:b> <urn:name> "Be\"ta"@en <urn:graph2> .
<urn:b> <urn:size> "42"^^<http://www.w3.org/2001/XMLSchema#integer> <urn:graph2> .
<urn:c> <urn:name> "default graph line" .
_:blank <urn:name> "skipped" <urn:graph1> .
<urn:c> <urn:knows> <urn:d> _:blankgraph .
malformed line
"""


@pytest.fixture(scope="module")
def nq_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("nq") / "data.nq"
    p.write_text(NQ)
    return str(p)


def test_read_nquads_grammar(spark, nq_path):
    from parj_spark.construct.rdf_io import read_nquads

    rows = {
        (r["s_uri"], r["p_uri"], r["o_uri"], r["g_uri"])
        for r in read_nquads(spark, nq_path).collect()
    }
    assert rows == {
        ("urn:a", "urn:name", "Alpha", "urn:graph1"),
        ("urn:a", "urn:knows", "urn:b", "urn:graph1"),
        # literal escapes + @lang/^^datatype canonicalization, per-graph
        ("urn:b", "urn:name", 'Be"ta', "urn:graph2"),
        ("urn:b", "urn:size", "42", "urn:graph2"),
        # a 3-term (default graph) line is legal inside an .nq file
        ("urn:c", "urn:name", "default graph line", None),
    }
    # named-graph filter pushes into the same pass
    g1 = read_nquads(spark, nq_path, graph="urn:graph1")
    assert g1.count() == 2


def test_read_ntriples_rejects_quad_lines(spark, nq_path):
    """A quad line must not silently parse as a triple with the graph term
    dropped — N-Triples scope stays strict; count_rejected surfaces them."""
    rows = {tuple(r) for r in read_ntriples(spark, nq_path).collect()}
    assert rows == {("urn:c", "urn:name", "default graph line")}


def test_import_rdf_nquads_end_to_end(spark, tmp_path):
    """fmt="nquads" runs the shared materialize tail over the graph-merged
    (default-graph union) triples; graph= imports one named graph only."""
    from parj_spark.construct.pipeline import import_rdf
    from parj_spark.query import BGPEngine

    nq = tmp_path / "g.nq"
    nq.write_text(
        "\n".join(
            [
                "<urn:n1> <urn:type> <urn:Nation> <urn:gA> .",
                "<urn:n2> <urn:type> <urn:Nation> <urn:gB> .",
                '<urn:n1> <urn:name> "One" <urn:gA> .',
            ]
        )
        + "\n"
    )
    store = import_rdf(spark, str(nq), str(tmp_path / "merged"), fmt="nquads")
    assert BGPEngine(store).count("?x urn:type urn:Nation") == 2
    only_a = import_rdf(
        spark, str(nq), str(tmp_path / "ga"), fmt="nquads", graph="urn:gA"
    )
    assert BGPEngine(only_a).count("?x urn:type urn:Nation") == 1
    with pytest.raises(ValueError):
        import_rdf(spark, str(nq), str(tmp_path / "bad"), fmt="turtle")


def test_nquads_to_graph_query(spark, nq_path):
    """read_nquads output feeds execute_on_quads directly (columns renamed
    to the quad relation's s/p/o/g): GRAPH ?g enumerates the named graphs,
    a constant GRAPH filters one, and non-GRAPH patterns see only the
    default-graph line."""
    from parj_spark.construct.rdf_io import read_nquads
    from parj_spark.query import execute_on_quads

    quads = (
        read_nquads(spark, nq_path)
        .withColumnsRenamed(
            {"s_uri": "s", "p_uri": "p", "o_uri": "o", "g_uri": "g"}
        )
    )
    per_graph = execute_on_quads(
        quads, "SELECT ?g ?s WHERE { GRAPH ?g { ?s <urn:name> ?n } }"
    )
    assert sorted(map(tuple, per_graph.collect())) == [
        ("urn:graph1", "urn:a"),
        ("urn:graph2", "urn:b"),
    ]
    one = execute_on_quads(
        quads, "SELECT ?o WHERE { GRAPH <urn:graph1> { <urn:a> <urn:knows> ?o } }"
    )
    assert [tuple(r) for r in one.collect()] == [("urn:b",)]
    default_only = execute_on_quads(quads, "SELECT ?s ?o WHERE { ?s <urn:name> ?o }")
    assert [tuple(r) for r in default_only.collect()] == [
        ("urn:c", "default graph line")
    ]
