"""Extra encoding-path tests: hash-id alternative and dictionary scale notes."""


from parj_spark.construct import encode


def test_hash_ids_deterministic_and_unique(spark, tiny_graph):
    triples = tiny_graph.triples_uri()
    d1 = encode.build_dictionary(triples, hash_ids=True)
    d2 = encode.build_dictionary(triples, hash_ids=True)
    n = d1.count()
    assert d1.select("id").distinct().count() == n  # no collisions at this scale
    # deterministic across builds
    assert d1.exceptAll(d2).count() == 0 and d2.exceptAll(d1).count() == 0
    # encode path works with hash ids too
    props = encode.build_properties(triples)
    enc = encode.encode_triples(triples, d1, props)
    assert enc.count() == triples.count()


def test_dense_ids_order_follows_sort(spark):
    terms = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",)], ["uri"]
    )
    d = encode._dense_ids(terms, "uri")
    got = {r["uri"]: r["id"] for r in d.collect()}
    assert got == {"a": 0, "b": 1, "c": 2}
