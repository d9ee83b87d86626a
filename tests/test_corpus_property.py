"""Property-based checks for the corpus-curation operators: pure-Python
oracles over random small corpora (hypothesis), mirroring the
test_cc_property.py pattern. Few examples, tiny inputs — each example
costs Spark jobs."""

from hypothesis import given, settings, strategies as st

from parj_spark.operators import corpus

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _py_repetition(text, short_n=2, long_n=5):
    toks = text.lower().split(" ")
    n = len(toks)

    def grams(k):
        return [" ".join(toks[i : i + k]) for i in range(n - k + 1)]

    top = 0.0
    if n >= short_n:
        g = grams(short_n)
        top = round(max(g.count(x) for x in set(g)) * short_n / n, 6)
    dup = 0.0
    if n >= long_n:
        g = grams(long_n)
        from collections import Counter

        c = Counter(g)
        dup = round(sum(v for v in c.values() if v >= 2) / len(g), 6)
    return n, top, dup


@settings(max_examples=5, deadline=None)
@given(docs=texts)
def test_repetition_stats_matches_python_oracle(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["top_2gram_frac"], r["dup_5gram_frac"])
        for r in corpus.repetition_stats(df).collect()
    }
    for i, t in enumerate(docs):
        n, top, dup = _py_repetition(t)
        gn, gtop, gdup = got[i]
        assert gn == n
        assert abs(gtop - top) < 1e-9, (t, gtop, top)
        assert abs(gdup - dup) < 1e-9, (t, gdup, dup)


@settings(max_examples=5, deadline=None)
@given(docs=texts, frac=st.integers(0, 10))
def test_stratified_sample_is_monotone_and_deterministic(spark, docs, frac):
    rows = [(i, t, "en") for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    lo = {r["doc_id"] for r in
          corpus.stratified_sample(df, {"en": frac / 10}).collect()}
    hi = {r["doc_id"] for r in
          corpus.stratified_sample(df, {"en": min(1.0, frac / 10 + 0.3)}).collect()}
    # a larger fraction keeps a superset (threshold semantics, same buckets)
    assert lo <= hi
    again = {r["doc_id"] for r in
             corpus.stratified_sample(df, {"en": frac / 10}).collect()}
    assert lo == again
    if frac == 10:
        assert lo == {i for i, _ in enumerate(docs)}


@settings(max_examples=5, deadline=None)
@given(docs=texts)
def test_remove_dup_spans_preserves_token_subsequence(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    k = 3
    out = {r["doc_id"]: r for r in corpus.remove_dup_spans(df, k=k).collect()}
    for i, t in enumerate(docs):
        orig = t.lower().split(" ")
        clean = out[i]["clean_text"].split(" ") if out[i]["clean_text"] else []
        # surviving tokens are a subsequence of the original, in order
        it = iter(orig)
        assert all(tok in it for tok in clean), (t, out[i]["clean_text"])
        assert out[i]["n_tokens_removed"] == len(orig) - len(clean)
