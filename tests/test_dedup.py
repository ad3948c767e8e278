"""Dedup family: behavioral tests on constructed near-duplicates."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    far = "completely different words about spark shuffles and parquet files everywhere"
    dup = base
    return spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, dup)], "doc_id long, text string"
    )


def test_ngram_jaccard_finds_near_dups(docs):
    from deepex_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2).collect()}
    assert pairs[(1, 4)] == 1.0           # exact dup
    assert pairs[(1, 2)] > 0.7            # near dup (one word differs)
    assert (1, 3) not in pairs            # unrelated


def test_minhash_estimates_jaccard(docs):
    from deepex_spark.operators.dedup import minhash_dup_pairs, minhash_signatures

    sig = minhash_signatures(docs, "text", "doc_id", n=3, k=16)
    rows = {r["id"]: [r[f"mh{i}"] for i in range(16)] for r in sig.collect()}
    assert rows[1] == rows[4]             # identical docs -> identical sigs
    agree_12 = sum(a == b for a, b in zip(rows[1], rows[2])) / 16
    agree_13 = sum(a == b for a, b in zip(rows[1], rows[3])) / 16
    assert agree_12 > agree_13            # estimate orders like true jaccard

    pairs = {(r["id_a"], r["id_b"]): r["est_sim"] for r in
             minhash_dup_pairs(docs, "text", "doc_id", n=3, k=16, bands=4, min_est_sim=0.4).collect()}
    assert pairs[(1, 4)] == 1.0


def test_simhash_hamming(docs):
    from deepex_spark.operators.dedup import simhash, simhash_dup_pairs

    sh = {r["id"]: r["simhash"] for r in simhash(docs, "text", "doc_id", bits=32).collect()}
    assert sh[1] == sh[4]
    ham_12 = bin(sh[1] ^ sh[2]).count("1")
    ham_13 = bin(sh[1] ^ sh[3]).count("1")
    assert ham_12 < ham_13
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_dup_pairs(docs, "text", "doc_id", bits=32, band_bits=8, max_hamming=4).collect()}
    assert pairs[(1, 4)] == 0


def test_embedding_lsh_finds_identical(spark):
    from deepex_spark.operators.dedup import embedding_near_dups

    v1 = [1.0, 0.0, 0.5, 0.2] * 16
    v2 = [x * 1.001 for x in v1]          # near-identical direction
    v3 = [(-1.0) ** i * (i % 7) for i in range(64)]
    emb = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3)], "vec_id long, embedding array<double>"
    )
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
             embedding_near_dups(emb, threshold=0.9, dim=64).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.999
    assert (1, 3) not in pairs


def test_signatures_partition_invariant(docs):
    from deepex_spark.operators.dedup import minhash_signatures

    one = {tuple(r) for r in minhash_signatures(docs.coalesce(1), "text", "doc_id").collect()}
    four = {tuple(r) for r in minhash_signatures(docs.repartition(4), "text", "doc_id").collect()}
    assert one == four
