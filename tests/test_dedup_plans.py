"""Plan-shape guards for the dedup family: candidate generation must go
through bucketed equi-joins (LSH bands / capped inverted index), never a
cartesian product — the property that keeps them alive at corpus scale."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_pairs_join_is_bucketed(spark):
    from deepex_spark.operators.dedup import minhash_dup_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _executed(minhash_dup_pairs(docs, "text", "doc_id"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_ngram_jaccard_join_is_bucketed(spark):
    from deepex_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _executed(ngram_jaccard_pairs(docs, "text", "doc_id"))
    assert "CartesianProduct" not in plan


def test_embedding_lsh_join_is_bucketed(spark):
    from deepex_spark.operators.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _executed(embedding_near_dups(emb, threshold=0.2, n_planes=6, n_tables=2))
    assert "CartesianProduct" not in plan
