"""Unit tests for the LLM-pipeline operator library (semantics the oracle
queries don't isolate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duva_spark.llm import dedup, minhash, similarity, simhash, textstats
from duva_spark.llm.multimodal import decode_image_features, payload_stats, to_media_table


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "completely different content about spark engines"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (5, "tiny"),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup_removes_exact_only(docs):
    kept = sorted(r.doc_id for r in dedup.dedup_exact(docs, ["text"], "doc_id").collect())
    assert kept == [1, 2, 3, 5]


def test_minhash_identical_signatures_for_exact_dups(docs):
    sig = minhash.with_signature(docs, n_hashes=8).select("doc_id", "mh_0", "mh_7").collect()
    by_id = {r.doc_id: (r.mh_0, r.mh_7) for r in sig}
    assert by_id[1] == by_id[4]
    assert by_id[1] != by_id[3]


def test_minhash_short_doc_empty_shingles(docs):
    row = (
        minhash.with_signature(docs, n_hashes=4)
        .filter(F.col("doc_id") == 5)
        .select("_shingles", "mh_0")
        .collect()[0]
    )
    assert row._shingles == [] and row.mh_0 is None


def test_near_duplicates_finds_planted_pair(docs):
    pairs = {(r.id_a, r.id_b) for r in minhash.near_duplicates(docs, "doc_id", threshold=0.5).collect()}
    assert (1, 4) in pairs  # exact dup: jaccard 1.0
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup via shared shingles
    assert all(a < b for a, b in pairs)


def test_simhash_close_for_near_dups(docs):
    out = {r.doc_id: r.sh for r in simhash.with_simhash(docs, out="sh").collect()}
    d_near = bin(out[1] ^ out[2]).count("1")
    d_far = bin(out[1] ^ out[3]).count("1")
    assert out[1] == out[4]  # exact dup → identical simhash
    assert d_near < d_far


def test_hamming_distance_column(spark):
    df = spark.createDataFrame([(0b1011, 0b0011)], "a long, b long")
    assert df.select(simhash.hamming_distance(F.col("a"), F.col("b")).alias("d")).collect()[0].d == 1


def test_cosine_self_similarity(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0]), (2, [2.0, 4.0, 6.0]), (3, [-3.0, 0.0, 1.0])],
                               "vec_id long, embedding array<double>")
    top = similarity.brute_force_topk(df, df.filter(F.col("vec_id") == 1), k=2)
    rows = {r.neighbor_id: r.cosine_sim for r in top.collect()}
    assert rows[2] == 1.0  # colinear
    assert rows[3] < 1.0


def test_ivf_assign_buckets(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    cents = similarity.label_centroids(emb)
    assigned = {r.vec_id: r.bucket for r in similarity.ivf_assign(emb, cents).collect()}
    assert assigned[1] == 0 and assigned[3] == 1


def test_textstats_columns(docs):
    out = textstats.with_text_stats(docs).filter(F.col("doc_id") == 1).collect()[0]
    assert out.n_tokens_ws == 9
    assert out.lang_pred == "en"  # two "the" markers
    assert 0.0 <= out.quality <= 1.0


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame([(1, "b a c"), (2, "c b a")], "doc_id long, text string")
    fps = [r.fp for r in df.select(textstats.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_multimodal_payload_roundtrip(docs):
    media = to_media_table(docs, "doc_id", "text")
    stats = {r.doc_id: r for r in payload_stats(media, "doc_id").collect()}
    assert stats[5].n_bytes == 4  # "tiny"
    assert stats[5].header_hex == "74696e79"  # utf-8 "tiny"
    assert stats[1].media_type == "image"


def test_multimodal_decode_stub_and_fake(docs):
    media = to_media_table(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|pillow"):
        decode_image_features(media, "doc_id", fake=False).collect()
    feats = decode_image_features(media, "doc_id", dim=8, fake=True).collect()
    assert len(feats) == 5 and len(feats[0].features) == 8
    again = decode_image_features(media, "doc_id", dim=8, fake=True).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))  # deterministic


def test_lsh_bucket_cap_bounds_candidates(spark):
    """With a hot bucket (many exact dups), the cap drops the flooded
    bucket but distinct near-dups still pair up."""
    from duva_spark.llm import minhash

    boiler = [(i, "the same boilerplate text repeated again and again here") for i in range(50)]
    pair = [
        (100, "a unique document about spark window aggregation semantics today"),
        (101, "a unique document about spark window aggregation semantics tonight"),
    ]
    df = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    capped = minhash.near_duplicates(df, "doc_id", threshold=0.5, max_bucket_size=10)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in pairs
    assert not any(a < 50 and b < 50 for a, b in pairs)  # flooded bucket dropped
    uncapped = minhash.near_duplicates(df, "doc_id", threshold=0.5)
    assert any(a < 50 and b < 50 for a, b in {(r.id_a, r.id_b) for r in uncapped.collect()})


def test_multimodal_resize_and_frame_sample(docs):
    from duva_spark.llm.multimodal import resize_images, sample_frames, to_media_table

    media = to_media_table(docs, "doc_id", "text")
    resized = resize_images(media, "doc_id", 32, 32, fake=True).collect()
    assert all(r.width == 32 and r.height == 32 and len(r.payload) > 0 for r in resized)
    frames = sample_frames(media, "doc_id", every_nth_byte=8, fake=True)
    per_doc = {r.doc_id: r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc[5] == 1  # "tiny" = 4 bytes → one frame
    assert per_doc[1] > 1  # longer doc → multiple frames
    with pytest.raises(Exception, match="pillow|NotImplementedError"):
        resize_images(media, "doc_id", 8, 8, fake=False).collect()
