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


def _fake_engine(props, stats, join_stats, class_stats=None):
    """Planner-only engine: bypass __init__ (no store) to unit-test ordering."""
    eng = BGPEngine.__new__(BGPEngine)
    eng._props = props
    eng._stats = stats
    eng._join_stats = join_stats
    eng._class_stats = class_stats or {}
    eng._hists = {}
    eng._type_pid = props.get("rdf:type")
    return eng


def test_dp_beats_greedy_on_hub_trap():
    """Hub-predicate cheap-first trap (the shape where greedy locks into a
    bad prefix): p1 is the smallest scan but joins p2 explosively; starting
    from p3 keeps every intermediate small. DP must pick the p3 side."""
    props = {"p1": 1, "p2": 2, "p3": 3}
    stats = {
        1: {"n": 10, "ndv_s": 10, "ndv_o": 10},
        2: {"n": 1000, "ndv_s": 1000, "ndv_o": 1000},
        3: {"n": 50, "ndv_s": 50, "ndv_o": 50},
    }
    join_stats = {
        (1, 2, "OS"): 100_000, (2, 1, "SO"): 100_000,  # hub: p1.o fans out in p2
        (2, 3, "OS"): 10, (3, 2, "SO"): 10,
    }
    eng = _fake_engine(props, stats, join_stats)
    pats = [
        Pattern("?a", "p1", "?b"),
        Pattern("?b", "p2", "?c"),
        Pattern("?c", "p3", "?d"),
    ]
    greedy = eng._order_greedy(pats, None)
    assert greedy[0] is pats[0], "trap precondition: greedy seeds the cheap hub scan"
    dp = eng._order(pats, None)
    assert dp[0] is pats[2], f"DP should start from p3, got {dp[0]}"
    assert dp[1] is pats[1] and dp[2] is pats[0]


def test_class_stats_change_join_order():
    """T2: with per-class stats, `?x rdf:type C` costs by the actual class
    size, so a big class anchors the join differently than a small one;
    without T2 both classes get the same uniform estimate."""
    props = {"rdf:type": 1, "p": 2}
    stats = {
        1: {"n": 101_000, "ndv_s": 100_000, "ndv_o": 2},
        2: {"n": 500, "ndv_s": 500, "ndv_o": 500},
    }
    terms = {"ub:Big": 7, "ub:Small": 8}
    eng = _fake_engine(props, stats, {}, class_stats={7: 100_000, 8: 10})
    big = [Pattern("?x", "rdf:type", "ub:Big"), Pattern("?x", "p", "?y")]
    small = [Pattern("?x", "rdf:type", "ub:Small"), Pattern("?x", "p", "?y")]
    assert eng._order(big, terms)[0] is big[1]      # scan p first, big type last
    assert eng._order(small, terms)[0] is small[0]  # tiny class anchors first
    # without T2 the two classes are indistinguishable (uniform n/ndv_o)
    eng0 = _fake_engine(props, stats, {})
    assert eng0._estimate(big[0], terms) == eng0._estimate(small[0], terms)


def test_engine_loads_class_stats(spark, tiny_graph):
    """The materialized T2 table matches exact per-class counts, and the
    engine estimates `?x rdf:type C` with them."""
    from pyspark.sql import functions as F

    eng = BGPEngine(tiny_graph)
    assert eng._class_stats, "class_stats should be materialized + loaded"
    spo = tiny_graph.spo()
    exact = {
        r["o"]: r["n"]
        for r in spo.filter(F.col("p") == eng._type_pid)
        .groupBy("o").agg(F.count("*").alias("n")).collect()
    }
    assert eng._class_stats == exact
    # estimate for a constant class equals its exact cardinality
    terms = eng._resolve_terms([Pattern("?x", "rdf:type", "ub:Course")])
    est = eng._estimate(Pattern("?x", "rdf:type", "ub:Course"), terms)
    assert est == exact[terms["ub:Course"]]


def test_equi_depth_histograms_exact_counts(spark):
    """Bucket counts partition the predicate exactly, and a hot key's bucket
    estimate dwarfs the uniform guess."""
    from parj_spark.construct.stats import equi_depth_histograms

    # p=1: object 7 appears 90x (hot), objects 100..109 once each (cold)
    rows = [(i, 1, 7) for i in range(90)] + [(i, 1, 100 + i) for i in range(10)]
    t = spark.createDataFrame(rows, ["s", "p", "o"])
    h = equi_depth_histograms(t, n_buckets=4).collect()
    by_col = {}
    for r in h:
        by_col.setdefault((r["p"], r["col"]), []).append(r)
    assert sum(r["n"] for r in by_col[(1, "o")]) == 100
    assert sum(r["n"] for r in by_col[(1, "s")]) == 100
    hot = [r for r in by_col[(1, "o")] if r["lo"] <= 7 <= r["hi"]]
    assert hot and hot[0]["n"] / hot[0]["ndv"] >= 45  # hot bucket ~90/2
    cold = [r for r in by_col[(1, "o")] if r["lo"] <= 105 <= r["hi"]]
    assert cold and cold[0]["n"] / cold[0]["ndv"] <= 5


def test_engine_histogram_estimates(spark, tiny_graph):
    """Engine loads the materialized histograms and estimates a constant-
    object pattern with the bucket stats (0 for absent-but-in-range ids is
    fine; hot rdf:type objects route through T2 instead)."""
    eng = BGPEngine(tiny_graph)
    assert eng._hists, "histograms should be materialized + loaded"
    # every (p, col) histogram partitions its predicate's triple count
    for (pid, col), buckets in eng._hists.items():
        assert sum(b[2] for b in buckets) == eng._stats[pid]["n"], (pid, col)
    # a constant-object estimate comes from the histogram, not n/ndv
    pats = [Pattern("?x", "ub:takesCourse", "ub:Course_0_0_0")]
    terms = eng._resolve_terms(pats)
    est = eng._estimate(pats[0], terms)
    assert est > 0
    # and ordering still yields correct results through the full engine
    res = eng.query(
        [Pattern("?x", "ub:takesCourse", "ub:Course_0_0_0"),
         Pattern("?x", "rdf:type", "ub:GraduateStudent")],
        decode=False,
    )
    assert res.count() >= 0
