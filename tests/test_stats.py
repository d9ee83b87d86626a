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
    assert eng._join_stats_df is not None, "join_stats table should exist"
    assert not eng._join_stats, "T3 hydration is lazy (per-query, VERDICT r3)"
    pats = [
        Pattern("?s", "ub:advisor", "?p"),
        Pattern("?s", "ub:takesCourse", "?c"),
        Pattern("?p", "ub:teacherOf", "?c"),
    ]
    ordered = eng._order(pats)
    assert len(ordered) == 3
    assert eng._join_stats, "ordering a query hydrates its T3 pairs"
    # result correctness unaffected by stats-driven ordering
    assert eng.query(pats, decode=False).count() == eng.count(pats)


def _fake_engine(props, stats, join_stats, class_stats=None, class_join_stats=None):
    """Planner-only engine: bypass __init__ (no store) to unit-test ordering."""
    eng = BGPEngine.__new__(BGPEngine)
    eng._props = props
    eng._stats = stats
    eng._join_stats = join_stats
    eng._class_stats = class_stats or {}
    eng._class_join_stats = class_join_stats or {}
    eng._cjs_classes = {k[0] for k in (class_join_stats or {})}
    eng._hists = {}
    eng._type_pid = props.get("rdf:type")
    # planner-only: no stats parquet behind the dicts -> hydration no-ops
    eng._join_stats_df = eng._cjs_df = eng._hist_df = None
    eng._hydrated_pids = set()
    eng._total_n = None
    eng._uniform_sums = None
    eng._props_inv = None
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


def test_class_restricted_cards_exact(spark):
    """Type-restricted T3 counts only join keys that are class instances."""
    from parj_spark.construct.stats import class_restricted_join_cardinalities

    TYPE = 9
    # classes: 7 = {1, 2}, 8 = {3}; p=1 edges from 1,2,3; p=2 edges from 1,3
    rows = (
        [(1, TYPE, 7), (2, TYPE, 7), (3, TYPE, 8)]
        + [(1, 1, 100), (2, 1, 101), (2, 1, 102), (3, 1, 103)]
        + [(1, 2, 200), (3, 2, 201)]
    )
    t = spark.createDataFrame(rows, ["s", "p", "o"])
    got = {
        (r.cls, r.p1, r.p2, r.orientation): r.card
        for r in class_restricted_join_cardinalities(t, TYPE).collect()
    }
    # SS p1 x p2 restricted to class 7 = keys {1,2}: k=1 -> 1*1 = 1 (k=2 has
    # no p2 edge); unrestricted would also count k=3 -> 1*1
    assert got[(7, 1, 2, "SS")] == 1
    assert got[(8, 1, 2, "SS")] == 1  # class 8 = {3}: k=3 -> 1*1
    # p1 self-join within class 7: k=1 -> 1, k=2 -> 4
    assert got[(7, 1, 1, "SS")] == 5
    assert got[(8, 1, 1, "SS")] == 1


def test_type_restricted_t3_flips_dp_order():
    """LUBM Q1/Q3 shape (QueryTester.java:107-119): a selective class
    anchoring a join. Unrestricted T3 sees the (type, p) join as hub-sized
    (dominated by the big class) and enters elsewhere; the class-restricted
    card (reference getTypeCardinality, parj.c:510-547) reveals the anchored
    join is tiny, so DP starts from the class anchor."""
    props = {"rdf:type": 1, "p": 2, "q": 3}
    stats = {
        1: {"n": 10_000, "ndv_s": 10_000, "ndv_o": 2},
        2: {"n": 1_000, "ndv_s": 1_000, "ndv_o": 1_000},
        3: {"n": 5_000, "ndv_s": 5_000, "ndv_o": 100},
    }
    terms = {"ub:Small": 8, "urn:K": 42}
    class_stats = {7: 9_990, 8: 10}
    join_stats = {
        (1, 2, "SS"): 900_000, (2, 1, "SS"): 900_000,  # hub via the big class
        (2, 3, "OS"): 5_000, (3, 2, "SO"): 5_000,
    }
    cjs = {  # restricted to Small, the (type, p) join is 3 rows
        (8, 1, 2, "SS"): 3, (8, 2, 1, "SS"): 3,
    }
    pats = [
        Pattern("?x", "rdf:type", "ub:Small"),
        Pattern("?x", "p", "?y"),
        Pattern("?y", "q", "urn:K"),
    ]
    base = _fake_engine(props, stats, join_stats, class_stats=class_stats)
    restricted = _fake_engine(
        props, stats, join_stats, class_stats=class_stats, class_join_stats=cjs
    )
    # unrestricted: the (type, p) join looks hub-sized, so the class anchor
    # is deferred to the very end; restricted: the anchored (type, p) join
    # is the cheapest pair, so the plan starts with it
    assert base._order(pats, terms)[-1] is pats[0], "precondition: hub-sized T3 defers the anchor"
    assert {id(p) for p in restricted._order(pats, terms)[:2]} == {id(pats[0]), id(pats[1])}


def test_dp_prefers_sort_aligned_order():
    """With every intermediate cardinality equal, the DP must not sandwich
    the y-join between the two x-joins: consecutive same-key joins keep the
    left side partitioned on the join key (bucketed sort-free SMJ), the
    reference's DPEntry.sorted / INDEX_UTILIZATION discount
    (NodeCostEstimator.java:451-523)."""
    props = {"pa": 1, "pb": 2, "pc": 3, "pd": 4}
    stats = {i: {"n": 100, "ndv_s": 100, "ndv_o": 100} for i in range(1, 5)}
    # sel edges only through the hub pattern A: every post-A join card = 100
    join_stats = {}
    for other in (2, 3):  # (pa, pb) and (pa, pc) on x (SS)
        join_stats[(1, other, "SS")] = 100
        join_stats[(other, 1, "SS")] = 100
    join_stats[(1, 4, "OS")] = 100  # (pa, pd) on y: pa.o = pd.s
    join_stats[(4, 1, "SO")] = 100
    eng = _fake_engine(props, stats, join_stats)
    pats = [
        Pattern("?x", "pa", "?y"),
        Pattern("?x", "pb", "?z"),
        Pattern("?x", "pc", "?w"),
        Pattern("?y", "pd", "?u"),
    ]
    order = eng._order(pats, None)
    idx = {id(p): i for i, p in enumerate(order)}
    b, c, d = idx[id(pats[1])], idx[id(pats[2])], idx[id(pats[3])]
    assert not (min(b, c) < d < max(b, c)), (
        f"y-join sandwiched between x-joins: {[str(p) for p in order]}"
    )


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
    assert eng._hist_df is not None, "histograms should be materialized"
    # hydrate the full catalog to check bucket-count invariants
    eng._hydrate([Pattern("?x", uri, "?y") for uri in eng._props])
    assert eng._hists, "histograms load on hydration"
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


def test_stat_hydration_is_per_query(spark, tiny_graph):
    """Engine init must not collect the O(predicates^2) stats tables
    (driver-memory cliff on wide catalogs, VERDICT r3 missing #3): a query
    hydrates only its own predicates' T3 pairs / histograms, and a repeat
    query re-collects nothing."""
    eng = BGPEngine(tiny_graph)
    assert eng._join_stats == {} and eng._hists == {}
    pats = [
        Pattern("?x", "ub:memberOf", "?d"),
        Pattern("?d", "ub:subOrganizationOf", "?u"),
    ]
    eng.query(pats, decode=False).count()
    q_pids = {eng._props["ub:memberOf"], eng._props["ub:subOrganizationOf"]}
    assert eng._hydrated_pids == q_pids
    # every cached pair/histogram row belongs to the query's predicates
    assert all(p1 in q_pids and p2 in q_pids for p1, p2, _ in eng._join_stats)
    assert all(p in q_pids for p, _ in eng._hists)
    # full-catalog comparison: the per-query load is a strict subset
    n_total_pairs = eng._join_stats_df.count()
    assert len(eng._join_stats) < n_total_pairs
    # repeat query: no new ids to hydrate
    before = set(eng._hydrated_pids)
    eng._hydrate(pats)
    assert eng._hydrated_pids == before
    # a second query widens the cache incrementally (pairs touching the new
    # predicate arrive, old pairs are not re-fetched)
    eng.query(
        pats + [Pattern("?u", "rdf:type", "ub:University")], decode=False
    ).count()
    assert eng._props["rdf:type"] in eng._hydrated_pids


def test_var_pred_estimate_matches_bruteforce_sum():
    """The O(1)-in-catalog variable-predicate estimate (catalog sums +
    per-pid corrections, VERDICT r4 planner finding) must equal the old
    per-predicate loop exactly — including the T2 class-stat override for
    rdf:type and histogram corrections for hydrated predicates."""
    props = {"rdf:type": 1, "p:a": 2, "p:b": 3, "p:c": 4}
    stats = {
        1: {"n": 1000, "ndv_s": 900, "ndv_o": 4},
        2: {"n": 500, "ndv_s": 250, "ndv_o": 100},
        3: {"n": 80, "ndv_s": 80, "ndv_o": 8},
        4: {"n": 12_000, "ndv_s": 3000, "ndv_o": 600},
    }
    eng = _fake_engine(props, stats, {}, class_stats={7: 640, 8: 3})
    # hydrated histogram for p:a's object column: one bucket [0, 50] n=200 ndv=10
    eng._hydrated_pids = {2}
    eng._hists[(2, "o")] = [(0, 50, 200, 10)]
    eng._hists[(2, "s")] = [(0, 10, 30, 3)]
    terms = {"urn:const": 7, "urn:s": 5}
    for pat in [
        Pattern("?s", "?p", "urn:const"),
        Pattern("urn:s", "?p", "?o"),
        Pattern("urn:s", "?p", "urn:const"),
    ]:
        brute = sum(
            eng._estimate(Pattern(pat.s, uri, pat.o), terms) for uri in props
        )
        fast = eng._estimate(pat, terms)
        assert abs(fast - brute) < 1e-9, (pat, fast, brute)


def test_var_pred_estimate_flat_in_catalog_size():
    """Driver-side cost of a constant-bound variable-predicate estimate must
    not scale with the predicate catalog: after the one-time catalog-sum
    build, per-call work is O(hydrated predicates). 5k-predicate catalog,
    generous wall-clock bound (the old loop re-ran the full catalog per
    call and blows far past this)."""
    import time

    def build(n_preds):
        props = {f"p:{i}": i for i in range(n_preds)}
        props["rdf:type"] = n_preds
        stats = {
            i: {"n": 100 + i % 37, "ndv_s": 1 + i % 11, "ndv_o": 1 + i % 7}
            for i in range(n_preds + 1)
        }
        return _fake_engine(props, stats, {}, class_stats={7: 99})

    def per_call(eng, reps=300):
        pat = Pattern("?s", "?p", "urn:const")
        eng._estimate(pat, {"urn:const": 7})  # warm the catalog sums
        t0 = time.perf_counter()
        for _ in range(reps):
            eng._estimate(pat, {"urn:const": 7})
        return (time.perf_counter() - t0) / reps

    small, large = per_call(build(100)), per_call(build(5000))
    # flat means the 50x catalog costs far less than 50x per call; allow
    # generous noise (interpreter jitter) with a 5x ceiling
    assert large < small * 5 + 1e-4, (small, large)
