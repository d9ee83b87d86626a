"""Behavioral unit tests for the training-data operators: planted
duplicates are found, LSH recalls the brute-force answer, fingerprints
overlap on shared substrings, multimodal plumbing keeps shapes."""

import pytest
from pyspark.sql import functions as F

from parj_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def planted_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup of 1
        (4, "completely different content about spark shuffle partitions and joins"),
        (5, "another unrelated text mentioning broadcast hash join strategies"),
        (6, base.replace("quick", "slow").replace("lazy", "angry")),  # medium sim
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_finds_planted(spark, planted_docs):
    groups = dedup.exact_dedup_groups(planted_docs).filter(F.col("n_dups") > 1)
    rows = groups.collect()
    assert len(rows) == 1
    assert rows[0]["canonical_id"] == 1 and rows[0]["n_dups"] == 2


def test_minhash_finds_near_dups(spark, planted_docs):
    pairs = dedup.minhash_lsh_pairs(
        planted_docs, shingle_n=2, n_hashes=8, bands=4, jaccard_threshold=0.5
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in found  # exact dup always caught
    assert (1, 3) in found or (2, 3) in found  # near dup caught
    assert (4, 5) not in found


def test_ngram_jaccard_ordering(spark, planted_docs):
    pairs = dedup.ngram_jaccard_pairs(planted_docs, shingle_n=2, threshold=0.1)
    j = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert j[(1, 2)] == 1.0
    assert j[(1, 3)] < 1.0 and j[(1, 3)] > j.get((1, 6), 0.0)


def test_simhash_similar_docs_close(spark, planted_docs):
    fp = {r.doc_id: r.simhash for r in dedup.simhash32(planted_docs).collect()}
    def hamming(a, b):
        return bin(a ^ b).count("1")
    assert fp[1] == fp[2]
    assert hamming(fp[1], fp[3]) < hamming(fp[1], fp[4])


def test_cosine_topk_matches_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = similarity.cosine_topk(emb, query_id=0, k=5)
    rows = exact.collect()
    assert len(rows) == 5
    sims = [r.cosine for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {r.vec_id for r in similarity.cosine_topk(emb, query_id=0, k=10).collect()}
    approx = {
        r.vec_id
        for r in similarity.cosine_lsh_topk(
            emb, query_id=0, k=10, n_planes=6, probe_bits=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH multiprobe recall too low: {recall}"


def test_winnow_shared_substring_overlap(spark):
    rows = [
        (1, "abcdefghijklmnopqrstuvwxyz0123456789 shared middle segment here xx"),
        (2, "zzzz shared middle segment here yyyy totally different otherwise ab"),
        (3, "nothing in common with the others at all qqqq wwww eeee rrrr tttt"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = text.winnow_fingerprints(df, k=5, window=4)
    sets = {
        r.doc_id: r.fps
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("fps")).collect()
    }
    shared_12 = len(set(sets[1]) & set(sets[2]))
    shared_13 = len(set(sets[1]) & set(sets[3]))
    assert shared_12 > shared_13


def test_langid_markers(spark):
    rows = [
        (1, "the cat and the dog of the house with hats"),
        (2, "der hund und die katze und das haus"),
        (3, "xyz qqq www"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.lang_guess for r in text.lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_multimodal_plumbing_shapes(spark, planted_docs):
    media = multimodal.attach_binary(planted_docs)
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = multimodal.decode_images(media)
    rows = decoded.collect()
    assert len(rows) == planted_docs.count()
    assert all(64 <= r.width < 64 + 1920 and 64 <= r.height < 64 + 1080 for r in rows)
    # determinism
    again = {r.doc_id: (r.width, r.height) for r in multimodal.decode_images(media).collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)
    resized = multimodal.resize_images(media, max_side=128)
    assert all(
        max(r.out_width, r.out_height) <= 128 for r in resized.collect()
    )
    frames = multimodal.sample_frames(media, every_n=10)
    f1 = frames.filter(F.col("doc_id") == 1).collect()
    assert all(r.frame_idx % 10 == 0 and r.frame_idx < r.n_frames for r in f1)


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {r.vec_id for r in similarity.cosine_topk(emb, query_id=0, k=10).collect()}
    approx = {
        r.vec_id
        for r in similarity.ivf_topk(
            emb, query_id=0, k=10, n_centroids=16, n_probe=6
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
