"""Plan-quality regression tests: the physical plans we verified by hand
must stay that way (partition pruning, column pruning, broadcast joins,
filter pushdown). These catch optimizer regressions that correctness tests
cannot see."""

from pyspark.sql import functions as F

from parj_spark.query import BGPEngine, Pattern


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bgp_plan_prunes_and_broadcasts(spark, tiny_graph):
    eng = BGPEngine(tiny_graph)
    df = eng.query(
        [
            Pattern("?s", "ub:advisor", "?p"),
            Pattern("?s", "ub:takesCourse", "?c"),
            Pattern("?p", "ub:teacherOf", "?c"),
        ],
        decode=False,
    )
    plan = _plan(df)
    # every pattern scan must hit exactly its predicate partition
    assert plan.count("PartitionFilters: [isnotnull(p") >= 3
    # salt column must be pruned from the read schema
    assert "salt" not in plan.split("ReadSchema")[1].splitlines()[0]
    # small scans broadcast: no shuffle exchange in the join chain
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_scan_filter_pushdown(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.filter(F.col("l_quantity") >= 48).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,48.0)]" in plan
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema  # column pruning held


def test_dict_decode_is_broadcast(spark, tiny_graph):
    eng = BGPEngine(tiny_graph)
    df = eng.query([Pattern("?x", "rdf:type", "ub:Course")], decode=True)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_dict_decode_size_gated(spark, tiny_graph):
    """broadcast_rows=0 forces the non-broadcast decode path: the decode
    join plans as a shuffle join (no broadcast hint) and returns the same
    rows as the broadcast path — the 100 TB dictionary fallback."""
    from parj_spark.query import BGPEngine, Pattern

    pats = [Pattern("?x", "rdf:type", "ub:Course")]
    df_b = BGPEngine(tiny_graph).query(pats, decode=True)
    df_s = BGPEngine(tiny_graph, broadcast_rows=0).query(pats, decode=True)
    # gated: no broadcast hint injected (Catalyst/AQE stays free to pick a
    # strategy from its own size estimates — at 100 TB the dict won't fit,
    # so no hint means no guaranteed-fatal 8 GB broadcast build)
    assert "ResolvedHint" not in df_s._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in df_b._jdf.queryExecution().analyzed().toString()
    assert sorted(r["x"] for r in df_b.collect()) == sorted(
        r["x"] for r in df_s.collect()
    )
