"""Degenerate-scale hardening: the full construction pipeline and the main
query paths over the SMALLEST corpus the generator can produce (one
department), where every table is a handful of rows.

Why this matters at 100 TB: the same code runs per-partition on slivers of
data — the last partition of a skewed predicate, a nearly-empty delta epoch,
a tenant with three documents. Stats hydration, the bucketed layout, plan
seeding, and the dictionary joins must all degrade to the trivial case
instead of assuming "big enough" inputs (empty stats rows, single-bucket
tables, broadcast sides of zero rows). The reference never exercises this
(its loader asserts a pre-built LUBM corpus); a from-scratch pipeline needs
the floor pinned explicitly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parj_spark.construct.pipeline import run_pipeline
from parj_spark.fixtures import gen_corpus
from parj_spark.query import BGPEngine, Pattern


@pytest.fixture(scope="module")
def micro(spark, tmp_path_factory):
    docs, gold = gen_corpus(spark, n_depts=1, seed=7)
    out = str(tmp_path_factory.mktemp("micrograph"))
    store = run_pipeline(spark, docs, out, resume=False)
    return store, gold


def test_micro_pipeline_meets_pr_gate(spark, micro):
    """The north-rule P/R >= 0.95 gate holds at the floor scale too."""
    store, gold = micro
    got = store.triples_uri().select("s_uri", "p_uri", "o_uri").distinct()
    gold_t = gold.select("s_uri", "p_uri", "o_uri").distinct()
    tp = got.intersect(gold_t).count()
    n_got, n_gold = got.count(), gold_t.count()
    assert n_gold > 0 and n_got > 0
    assert tp / n_got >= 0.95
    assert tp / n_gold >= 0.95


def test_micro_layout_and_stats_exist(spark, micro):
    """Bucketed layout + per-predicate stats are written even when each
    (predicate, bucket) cell holds a few rows or none."""
    import os

    store, _ = micro
    assert os.path.exists(os.path.join(store.out_dir, "bucketed", "spo"))
    stats = spark.read.parquet(os.path.join(store.out_dir, "stats"))
    assert stats.count() > 0
    assert stats.filter(F.col("n") <= 0).count() == 0


def test_micro_engine_answers_on_both_layouts(spark, micro):
    """A join query plans and answers identically over the bucketed layout
    and the partitioned fallback at floor scale (stats rows are tiny, some
    estimates are 0 — the planner must still produce a valid order)."""
    store, _ = micro
    pats = [
        Pattern("?x", "ub:memberOf", "?d"),
        Pattern("?x", "ub:name", "?n"),
    ]
    a = BGPEngine(store).query(pats)
    b = BGPEngine(store, bucketed_prefix=None).query(pats)
    rows_a = sorted(map(tuple, a.select("x", "d", "n").collect()))
    rows_b = sorted(map(tuple, b.select("x", "d", "n").collect()))
    assert rows_a == rows_b
    assert len(rows_a) > 0


def test_micro_absent_predicate_and_term_are_empty(spark, micro):
    """Patterns over a predicate or constant the dictionary has never seen
    return empty frames with the projected columns, on every path."""
    store, _ = micro
    eng = BGPEngine(store)
    no_pred = eng.query([Pattern("?x", "ub:NoSuchPredicate", "?y")])
    assert no_pred.count() == 0
    assert set(no_pred.columns) == {"x", "y"}
    no_term = eng.sparql(
        "SELECT ?x WHERE { ?x <ub:memberOf> <ub:Nowhere_404> . }"
    )
    assert no_term.count() == 0
    # SPARQL aggregate over the empty solution set: one zero-count row
    n = eng.sparql(
        "SELECT (COUNT(*) AS ?n) WHERE { ?x <ub:NoSuchPredicate> ?y }",
        aggregates=True,
    ).collect()
    assert [r["n"] for r in n] == [0]


def test_micro_modifiers_on_tiny_relations(spark, micro):
    """DISTINCT / ORDER / LIMIT / OFFSET where the whole relation is smaller
    than the requested page."""
    store, _ = micro
    eng = BGPEngine(store)
    total = eng.sparql(
        "SELECT DISTINCT ?d WHERE { ?x <ub:memberOf> ?d . }"
    ).count()
    assert total >= 1
    page = eng.sparql(
        "SELECT DISTINCT ?d WHERE { ?x <ub:memberOf> ?d . } "
        f"ORDER BY ASC(?d) LIMIT 50 OFFSET {total}",
        offset=True,
    )
    assert page.count() == 0  # page past the end, not an error
