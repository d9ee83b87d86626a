"""Golden BGP tests: engine results over the materialized graph must equal
independent joins over the gold triples table (LUBM-analog query shapes,
mirroring the reference's embedded corpus QueryTester.java:107-119)."""

import pytest
from pyspark.sql import functions as F

from parj_spark.query import BGPEngine, Pattern, parse_bgp


@pytest.fixture(scope="module")
def engine(tiny_graph):
    return BGPEngine(tiny_graph)


def _gold_rel(gold, pred):
    return gold.filter(F.col("p_uri") == pred).select(
        F.col("s_uri").alias("s"), F.col("o_uri").alias("o")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_q2_analog_course_names(engine, tiny_corpus):
    """?x rdf:type ub:Course . ?x ub:name ?y  (LUBM Q2 shape)."""
    _, gold = tiny_corpus
    res = engine.query(
        [Pattern("?x", "rdf:type", "ub:Course"), Pattern("?x", "ub:name", "?y")]
    )
    types = _gold_rel(gold, "rdf:type").filter(F.col("o") == "ub:Course").select("s")
    names = _gold_rel(gold, "ub:name")
    exp = types.join(names, "s").select(F.col("s").alias("x"), F.col("o").alias("y"))
    assert _rows(res) == _rows(exp)
    assert res.columns == ["x", "y"]


def test_q4_analog_professor_profile(engine, tiny_corpus):
    """Star: professor of a given department with 3 attributes (LUBM Q4)."""
    _, gold = tiny_corpus
    dept = "ub:Department_0_0"
    res = engine.query(
        [
            Pattern("?x", "ub:worksFor", dept),
            Pattern("?x", "rdf:type", "ub:FullProfessor"),
            Pattern("?x", "ub:name", "?n"),
            Pattern("?x", "ub:emailAddress", "?e"),
        ],
        select=["x", "n", "e"],
    )
    works = _gold_rel(gold, "ub:worksFor").filter(F.col("o") == dept)
    names = _gold_rel(gold, "ub:name")
    emails = _gold_rel(gold, "ub:emailAddress")
    exp = (
        works.select("s")
        .join(names, "s")
        .withColumnRenamed("o", "n")
        .join(emails, "s")
        .select(F.col("s").alias("x"), "n", F.col("o").alias("e"))
    )
    assert _rows(res) == _rows(exp)


def test_q9_analog_triangle(engine, tiny_corpus):
    """Triangle join: ?s advisor ?p . ?s takesCourse ?c . ?p teacherOf ?c."""
    _, gold = tiny_corpus
    res = engine.query(
        [
            Pattern("?s", "ub:advisor", "?p"),
            Pattern("?s", "ub:takesCourse", "?c"),
            Pattern("?p", "ub:teacherOf", "?c"),
        ]
    )
    adv = _gold_rel(gold, "ub:advisor").select(F.col("s").alias("st"), F.col("o").alias("pr"))
    takes = _gold_rel(gold, "ub:takesCourse").select(
        F.col("s").alias("st"), F.col("o").alias("co")
    )
    teaches = _gold_rel(gold, "ub:teacherOf").select(
        F.col("s").alias("pr"), F.col("o").alias("co")
    )
    exp = adv.join(takes, "st").join(teaches, ["pr", "co"]).select(
        F.col("co").alias("c"), F.col("pr").alias("p"), F.col("st").alias("s")
    )
    assert res.count() > 0
    assert _rows(res.select("c", "p", "s")) == _rows(exp)


def test_chain_and_parse(engine, tiny_corpus):
    """2-hop chain via the text parser: member -> dept -> university."""
    _, gold = tiny_corpus
    res = engine.query(
        parse_bgp(
            """
            ?x ub:memberOf ?d .
            ?d ub:subOrganizationOf ?u .
            """
        )
    )
    member = _gold_rel(gold, "ub:memberOf").select(F.col("s").alias("x"), F.col("o").alias("d"))
    suborg = _gold_rel(gold, "ub:subOrganizationOf").select(
        F.col("s").alias("d"), F.col("o").alias("u")
    )
    exp = member.join(suborg, "d").select("d", "u", "x")
    assert _rows(res.select("d", "u", "x")) == _rows(exp)


def test_count_and_distinct(engine):
    n_all = engine.count([Pattern("?x", "rdf:type", "?t")])
    res_d = engine.query([Pattern("?x", "rdf:type", "?t")], distinct=True, decode=False)
    assert n_all == res_d.count()  # type triples are unique already


def test_unknown_terms_give_empty(engine):
    assert engine.count([Pattern("?x", "ub:noSuchPred", "?y")]) == 0
    assert engine.count([Pattern("?x", "rdf:type", "ub:NoSuchClass")]) == 0


def test_fully_bound_existence(engine, tiny_corpus):
    _, gold = tiny_corpus
    row = gold.filter(~F.col("is_lit")).first()
    res = engine.query(
        [
            Pattern(row.s_uri, row.p_uri, row.o_uri),
            Pattern("?x", "rdf:type", "ub:University"),
        ]
    )
    assert res.count() > 0


def test_optional_left_join(engine, tiny_corpus):
    """OPTIONAL: every student row survives; email only bound for profs."""
    _, gold = tiny_corpus
    res = engine.query(
        [Pattern("?x", "rdf:type", "ub:UndergraduateStudent")],
        optional=[Pattern("?x", "ub:emailAddress", "?e")],
    )
    n_students = gold.filter(
        (F.col("p_uri") == "rdf:type")
        & (F.col("o_uri") == "ub:UndergraduateStudent")
    ).count()
    rows = res.collect()
    assert len(rows) == n_students
    assert all(r["e"] is None for r in rows)  # students have no email in fixture
    # and a binding case: professors all have emails
    res2 = engine.query(
        [Pattern("?x", "rdf:type", "ub:FullProfessor")],
        optional=[Pattern("?x", "ub:emailAddress", "?e")],
    )
    assert all(r["e"] is not None for r in res2.collect())


def test_order_by_limit(engine):
    res = engine.query(
        [Pattern("?x", "rdf:type", "ub:Course"), Pattern("?x", "ub:name", "?y")],
        order_by=["y"],
        limit=5,
    )
    rows = [r["y"] for r in res.collect()]
    assert len(rows) == 5 and rows == sorted(rows)


def test_select_unbound_var_dropped(engine):
    """A select var bound by no pattern is dropped consistently for both
    decode branches (round-1: decode=True raised AnalysisException)."""
    pats = [Pattern("?x", "rdf:type", "ub:Course")]
    assert engine.query(pats, select=["x", "nope"], decode=True).columns == ["x"]
    assert engine.query(pats, select=["x", "nope"], decode=False).columns == ["x"]


def test_variable_predicate_single(engine, tiny_corpus):
    """?x ?p <const-object>: reads OSP (no predicate partition filter) and
    binds the predicate var; decoded via the properties catalog. Extension
    beyond the reference (which rejects var predicates outright)."""
    _, gold = tiny_corpus
    obj = "ub:Course_0_0_1"
    res = engine.query([Pattern("?x", "?p", obj)])
    exp = gold.filter(F.col("o_uri") == obj).select(
        F.col("s_uri").alias("x"), F.col("p_uri").alias("p")
    )
    assert _rows(res.select("p", "x")) == _rows(exp.select("p", "x"))
    assert res.count() > 0


def test_variable_predicate_join(engine, tiny_corpus):
    """Var-p pattern joined with a bound-p pattern on an entity var."""
    _, gold = tiny_corpus
    obj = "ub:Course_0_0_1"
    res = engine.query(
        [Pattern("?x", "?p", obj), Pattern("?x", "rdf:type", "?t")]
    )
    left = gold.filter(F.col("o_uri") == obj).select(
        F.col("s_uri").alias("x"), F.col("p_uri").alias("p")
    )
    types = gold.filter(F.col("p_uri") == "rdf:type").select(
        F.col("s_uri").alias("x"), F.col("o_uri").alias("t")
    )
    exp = left.join(types, "x").select("p", "t", "x")
    assert _rows(res.select("p", "t", "x")) == _rows(exp)


def test_variable_predicate_mixed_space_rejected(engine):
    """A var in both predicate and entity position spans two id spaces."""
    with pytest.raises(ValueError):
        engine.query([Pattern("?x", "?p", "?y"), Pattern("?p", "rdf:type", "?t")])
