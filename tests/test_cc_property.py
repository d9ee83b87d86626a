"""Property-based check: distributed connected components == classic
union-find, over random small graphs (hypothesis)."""

from hypothesis import given, settings, strategies as st

from parj_spark.construct.canonicalize import connected_components


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


edge_lists = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)).map(
        lambda t: (f"n{t[0]}", f"n{t[1]}")
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(edges=edge_lists)
def test_cc_matches_union_find(spark, edges):
    # both execution paths must agree with the oracle: the size-gated
    # driver-local solver (default — these edge sets are under the gate)
    # and the distributed loop (collect_below=0 forces it)
    df = spark.createDataFrame(edges, ["src", "dst"])
    for gate in (1_000_000, 0):
        labels, _ = connected_components(df, collect_below=gate)
        got = {r["node"]: r["component"] for r in labels.collect()}
        assert got == _uf_oracle(edges)


def _chain(n):
    # path graph n0-n1-...-n{n}: diameter n, worst case for min-propagation
    return [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(n)]


def test_cc_pointer_doubling_handles_deep_chain(spark):
    edges = _chain(300)
    df = spark.createDataFrame(edges, ["src", "dst"])
    # collect_below=0: this pins the DISTRIBUTED loop's doubling escape
    # hatch (the local solver has its own doubling, covered above)
    labels, iters = connected_components(df, collect_below=0)
    # plain min-propagation needs ~300 rounds; doubling kicks in after 3
    # and halves remaining depth per round -> well under the 25-round cap
    assert iters <= 15
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == _uf_oracle(edges)
    assert set(got.values()) == {"n0000"}


def test_cc_raises_instead_of_returning_partial_labels(spark):
    import pytest

    df = spark.createDataFrame(_chain(40), ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        # doubling disabled (shortcut_after past max_iter): 3 rounds cannot
        # close a 40-deep chain, and partial labels must never leak out.
        # collect_below=0 pins the distributed loop (the local solver
        # always returns complete labels, so the contract lives there)
        connected_components(df, max_iter=3, shortcut_after=99, collect_below=0)


def test_cc_local_path_deep_chain_and_gate_boundary(spark):
    # the driver-local solver on a deep chain (vectorized doubling), plus
    # the gate boundary: a set of exactly collect_below edges goes local,
    # one more falls through to the distributed loop — identical labels
    edges = _chain(120)
    df = spark.createDataFrame(edges, ["src", "dst"])
    oracle = _uf_oracle(edges)
    local, _ = connected_components(df, collect_below=len(edges))
    assert {r["node"]: r["component"] for r in local.collect()} == oracle
    dist, _ = connected_components(df, collect_below=len(edges) - 1)
    assert {r["node"]: r["component"] for r in dist.collect()} == oracle
