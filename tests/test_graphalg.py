"""Graph-analytics operators: degree profile exact, PageRank vs a numpy
power-iteration reference (same teleport + dangling-mass redistribution)."""

import numpy as np
from pyspark.sql import functions as F

from parj_spark.operators import graphalg


def _np_pagerank(edge_list, n_iter=10, damping=0.85):
    nodes = sorted({x for e in edge_list for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in set(edge_list):
        A[idx[d], idx[s]] += 1.0
    outd = A.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        W = np.where(outd > 0, A / outd, 0.0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = r[outd == 0].sum()
        r = (1 - damping) / n + damping * (W @ r + dang / n)
    return {nodes[i]: r[i] for i in range(n)}


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),          # d has no in-links
    ("c", "e"),          # e is dangling (no out-links)
]


def test_degree_stats_exact(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    out = {r["node"]: (r["out_deg"], r["in_deg"]) for r in
           graphalg.degree_stats(df).collect()}
    assert out == {
        "a": (2, 1), "b": (1, 1), "c": (2, 3), "d": (1, 0), "e": (0, 1),
    }


def test_pagerank_matches_numpy_reference(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in graphalg.pagerank(df, n_iter=10).collect()}
    want = _np_pagerank(EDGES, n_iter=10)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])
    # dangling redistribution keeps the distribution normalized
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # structure sanity: the hub c outranks the teleport-only floor nodes
    assert got["c"] > got["d"]


def test_pagerank_duplicate_edges_dedup(spark):
    dup = EDGES + EDGES  # same graph listed twice
    got = {r["node"]: r["rank"] for r in
           graphalg.pagerank(spark.createDataFrame(dup, ["src", "dst"])).collect()}
    want = _np_pagerank(EDGES)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9


def test_pagerank_releases_iteration_state(spark):
    # operators must not leak cached state into the shared session. The
    # per-iteration localCheckpoint blocks are freed asynchronously by the
    # ContextCleaner once the driver references drop (pagerank gc.collect()s
    # on exit), so the contract here is EVENTUAL release: storage returns
    # to baseline (+ the live result checkpoint) within a bounded wait.
    import gc
    import time

    def storage_ids():
        return {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    before = storage_ids()
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    result = graphalg.pagerank(df, n_iter=3)
    assert result.count() == 5
    del result
    gc.collect()
    deadline = time.time() + 30
    leaked = storage_ids() - before
    while leaked and time.time() < deadline:
        time.sleep(1)
        spark.sparkContext._jvm.System.gc()
        leaked = storage_ids() - before
    assert not leaked, leaked
