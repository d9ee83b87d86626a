"""W3C SPARQL 1.1 result serializers: term typing must agree with the
exporter's URI-shape rule, ASK gets the boolean envelope, unbound
variables vanish from JSON bindings and serialize empty in CSV/TSV."""

import json

from parj_spark.query import results


def _df(spark):
    rows = [
        ("urn:cust:1", "Customer One", 42, None),
        ("urn:cust:2", 'quote " and\ttab', 7, 1.5),
    ]
    return spark.createDataFrame(rows, ["s", "name", "n", "score"])


def test_sparql_json_bindings(spark):
    out = json.loads(results.to_sparql_json(_df(spark)))
    assert out["head"]["vars"] == ["s", "name", "n", "score"]
    b0, b1 = sorted(out["results"]["bindings"], key=lambda b: b["s"]["value"])
    # URI-shaped terms type as uri, plain strings as literal
    assert b0["s"] == {"type": "uri", "value": "urn:cust:1"}
    assert b0["name"]["type"] == "literal"
    # numerics carry xsd datatypes
    assert b0["n"]["datatype"].endswith("integer") and b0["n"]["value"] == "42"
    assert b1["score"]["datatype"].endswith("double")
    # unbound variable: absent from the binding, not null
    assert "score" not in b0


def test_sparql_json_ask_envelope(spark, tiny_graph):
    from parj_spark.query import BGPEngine

    eng = BGPEngine(tiny_graph)
    df = eng.sparql("PREFIX ub:<ub:> ASK { ?x ub:advisor ?y }", ask=True)
    out = json.loads(results.to_sparql_json(df))
    assert out == {"head": {}, "boolean": True}


def test_csv_and_tsv_forms(spark):
    df = _df(spark)
    csv_text = results.to_csv(df)
    lines = csv_text.strip().split("\r\n")
    assert lines[0] == "s,name,n,score"
    # CSV carries raw lexical forms; unbound is the empty cell
    assert lines[1].startswith("urn:cust:1,Customer One,42,")
    tsv_text = results.to_tsv(df)
    tlines = tsv_text.strip().split("\n")
    assert tlines[0] == "?s\t?name\t?n\t?score"
    # TSV carries full term syntax: bracketed IRIs, escaped quoted literals
    assert tlines[1].split("\t")[0] == "<urn:cust:1>"
    row2 = next(ln for ln in tlines[1:] if "urn:cust:2" in ln)
    assert '"quote \\" and\\ttab"' in row2


def test_distributed_csv_write(spark, tmp_path):
    out = str(tmp_path / "res")
    results.write_csv_results(_df(spark), out, partitions=1)
    got = spark.read.option("header", True).csv(out)
    assert got.count() == 2
    assert set(got.columns) == {"s", "name", "n", "score"}
