from pyspark.sql import Window
from pyspark.sql import functions as F

from parj_spark.fixtures import documents_kg_df
from parj_spark.fixtures import ontology as O


def test_docs_shape_and_determinism(spark, tiny_corpus):
    docs, _ = tiny_corpus
    assert docs.columns == ["doc_id", "spans"]
    n = docs.count()
    assert n > 50
    # deterministic across regeneration
    docs2 = documents_kg_df(spark, n_depts=8, seed=42)
    a = docs.select("doc_id", F.to_json("spans").alias("j")).orderBy("doc_id")
    b = docs2.select("doc_id", F.to_json("spans").alias("j")).orderBy("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_spans_monotonic_offsets(spark, tiny_corpus):
    docs, _ = tiny_corpus
    ex = docs.select("doc_id", F.posexplode("spans").alias("pos", "sp"))
    bad = (
        ex.withColumn(
            "prev", F.lag("sp.offset").over(Window.partitionBy("doc_id").orderBy("pos"))
        )
        .filter(F.col("prev").isNotNull() & (F.col("sp.offset") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_gold_triples_sane(spark, tiny_corpus):
    _, gold = tiny_corpus
    assert gold.columns == ["s_uri", "p_uri", "o_uri", "is_lit"]
    preds = {r.p_uri for r in gold.select("p_uri").distinct().collect()}
    assert preds == set(O.PREDICATES)
    # rdf:type is the hottest predicate (skew fixture)
    counts = dict(
        gold.groupBy("p_uri").count().rdd.map(lambda r: (r["p_uri"], r["count"])).collect()
    )
    assert counts[O.RDF_TYPE] == max(counts.values())
    # no duplicate gold facts
    assert gold.count() == gold.distinct().count()


def test_media_spans_present(spark, tiny_corpus):
    docs, _ = tiny_corpus
    kinds = {
        r.kind
        for r in docs.select(F.explode("spans").alias("sp"))
        .select(F.col("sp.kind").alias("kind"))
        .distinct()
        .collect()
    }
    assert "text" in kinds and len(kinds & {"image", "audio", "table"}) >= 2
