"""Operator-level tests: dedup family, similarity search, text analysis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from archive_to_parquet_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_deterministic,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from archive_to_parquet_spark.operators.similarity import (
    brute_force_top_k,
    lsh_top_k,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different text about spark shuffles and parquet files here"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1
        (4, far),
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_contract(spark, docs_with_dups):
    df = docs_with_dups.withColumn("hash", F.sha2("text", 256))
    out = dedup_exact(df, "hash")
    # deterministic SET of hashes, winner unspecified (reference contract)
    assert out.count() == 4
    assert set(out.select("hash").toPandas()["hash"]) == set(
        df.select("hash").distinct().toPandas()["hash"]
    )


def test_dedup_deterministic_winner(spark, docs_with_dups):
    df = docs_with_dups.withColumn("hash", F.sha2("text", 256))
    out = dedup_exact_deterministic(df, "hash", order_cols=("doc_id",))
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 3, 4, 5}  # doc 2 loses to doc 1


def test_minhash_finds_near_dups(spark, docs_with_dups):
    pairs = minhash_near_duplicates(
        docs_with_dups, "doc_id", "text", num_hashes=32, bands=16,
        jaccard_threshold=0.5,
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found  # exact dup always collides
    assert (1, 3) in found or (2, 3) in found  # near dup
    assert all({a, b} != {4, 5} for a, b in found)


def test_simhash_finds_near_dups(spark, docs_with_dups):
    pairs = simhash_near_duplicates(
        docs_with_dups, "doc_id", "text", max_hamming=10
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found
    hamming = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert hamming[(1, 2)] == 0


def test_ngram_jaccard_exact_values(spark, docs_with_dups):
    pairs = ngram_jaccard_pairs(
        docs_with_dups, "doc_id", "text", shingle_n=3, threshold=0.1
    ).collect()
    jac = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert jac[(1, 2)] == 1.0
    assert 0.5 < jac[(1, 3)] < 1.0


def test_brute_force_topk_self_is_best(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_top_k(emb, q, k=5).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        assert len(rows) == 5
        best = min(rows, key=lambda r: r.rank)
        assert best.vec_id == qid  # self-similarity = 1.0 tops the list
        assert best.cosine == pytest.approx(1.0, abs=1e-9)


def test_lsh_topk_recall_against_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_top_k(emb, q, k=5).collect()
    approx = lsh_top_k(emb, q, k=5, num_planes=8, multi_probe_bits=2).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"LSH recall too low: {recall}"
    # self-match must always survive (identical vector, same bucket)
    for r in approx:
        if r.rank == 1:
            assert r.query_id == r.vec_id


def test_connected_components(spark):
    from archive_to_parquet_spark.operators.dedup import connected_components

    # two chains + a triangle + isolated pair: components {1..4}, {10,11,12}, {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    out = {r.id: r.component for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_near_duplicate_clusters(spark, docs_with_dups):
    from archive_to_parquet_spark.operators.dedup import near_duplicate_clusters

    labeled = near_duplicate_clusters(
        docs_with_dups, "doc_id", "text", jaccard_threshold=0.5,
        num_hashes=32, bands=16,
    ).collect()
    by_id = {r.id: r for r in labeled}
    # docs 1,2 (exact dup) and likely 3 (near) share a component
    assert by_id[1].component == by_id[2].component
    # singletons are their own representative
    assert by_id[4].is_representative
    assert by_id[5].is_representative
    # exactly one representative per component
    reps = {}
    for r in labeled:
        reps.setdefault(r.component, 0)
        reps[r.component] += int(r.is_representative)
    assert all(v == 1 for v in reps.values())


def test_ivf_topk_recall_against_brute_force(spark):
    from archive_to_parquet_spark.operators.similarity import ivf_top_k

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_top_k(emb, q, k=5).collect()
    approx = ivf_top_k(emb, q, k=5, n_list=8, n_probe=3).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # the query vector itself lands in its own probed bucket → rank 1
    for r in approx:
        if r.rank == 1:
            assert r.query_id == r.vec_id


def test_language_id_heuristic(spark):
    from archive_to_parquet_spark.functions.text import language_id_col

    rows = [
        (1, "the cat and the dog is in that house for it was cold"),
        (2, "el perro y la casa de los árboles en un día es bueno"),
        (3, "das ist der Hund und die Katze mit einem Haus nicht zu"),
        (4, "xyzzy plugh 12345"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.guess for r in df.select("id", language_id_col("text").alias("guess")).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "und"


def test_multimodal_plumbing(spark):
    from archive_to_parquet_spark.operators.multimodal import (
        extract_image_features,
        sample_video_frames,
    )

    rows = [(i, bytes([i]) * (50 + i)) for i in range(8)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    feats = extract_image_features(df).collect()
    assert len(feats) == 8
    for r in feats:
        assert len(r.feature) == 16
        assert 16 <= r.width < 80
    # deterministic: same bytes → same features
    feats2 = extract_image_features(df).collect()
    assert {(r.media_id, tuple(r.feature)) for r in feats} == {
        (r.media_id, tuple(r.feature)) for r in feats2
    }
    frames = sample_video_frames(df, every_n=30).collect()
    assert len(frames) >= 8
    assert all(len(r.frame) == 32 for r in frames)
    from archive_to_parquet_spark.operators.multimodal import extract_audio_features

    audio = extract_audio_features(df).collect()
    assert len(audio) == 8
    for r in audio:
        assert r.sample_rate in (8000, 16000, 22050, 44100)
        assert abs(r.duration_s - r.n_samples / r.sample_rate) < 1e-9
        assert len(r.mfcc) == 13
