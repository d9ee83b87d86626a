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
    df = spark.createDataFrame(edges, ["src", "dst"])
    labels, _ = connected_components(df)
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == _uf_oracle(edges)
