"""T3 pairwise join-cardinality stats: exact DataFrame job vs hand-computed
truth on a tiny graph, plus planner wiring."""


from parj_spark.construct.stats import pairwise_join_cardinalities
from parj_spark.query import BGPEngine, Pattern


def test_pairwise_cards_exact(spark):
    # p=1: (1,10),(2,10),(2,11)   p=2: (10,5),(11,5)
    rows = [(1, 1, 10), (2, 1, 10), (2, 1, 11), (10, 2, 5), (11, 2, 5)]
    t = spark.createDataFrame(rows, ["s", "p", "o"])
    cards = {
        (r.p1, r.p2, r.orientation): r.card
        for r in pairwise_join_cardinalities(t).collect()
    }
    # OS: o of p1 joins s of p2: o(p1)={10,10,11}, s(p2)={10,11} -> 2+1=3
    assert cards[(1, 2, "OS")] == 3
    # SS p1xp1: s histogram {1:1, 2:2} -> 1+4=5
    assert cards[(1, 1, "SS")] == 5
    # SO p2 x p1: s(p2)={10,11} vs o(p1)={10:2, 11:1} -> 2+1=3
    assert cards[(2, 1, "SO")] == 3


def test_per_key_cap(spark):
    rows = [(i, 1, 99) for i in range(10)] + [(99, 2, 1)]
    t = spark.createDataFrame(rows, ["s", "p", "o"])
    full = {
        (r.p1, r.p2, r.orientation): r.card
        for r in pairwise_join_cardinalities(t).collect()
    }
    capped = {
        (r.p1, r.p2, r.orientation): r.card
        for r in pairwise_join_cardinalities(t, per_key_cap=3).collect()
    }
    assert full[(1, 2, "OS")] == 10 and capped[(1, 2, "OS")] == 3


def test_engine_loads_join_stats_and_orders(spark, tiny_graph):
    eng = BGPEngine(tiny_graph)
    assert eng._join_stats, "join_stats table should be materialized + loaded"
    pats = [
        Pattern("?s", "ub:advisor", "?p"),
        Pattern("?s", "ub:takesCourse", "?c"),
        Pattern("?p", "ub:teacherOf", "?c"),
    ]
    ordered = eng._order(pats)
    assert len(ordered) == 3
    # result correctness unaffected by stats-driven ordering
    assert eng.query(pats, decode=False).count() == eng.count(pats)
