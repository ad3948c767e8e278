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


def test_entity_match_pairs_join_is_blocked_not_cartesian(spark):
    from deepex_spark.operators.linking import entity_match_pairs

    ents = spark.read.parquet("fixtures/entities.parquet")
    plan = _executed(entity_match_pairs(ents))
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan  # filter runs JVM-side, not in Python
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_extract_outlinks_is_udf_free_single_exchange(spark):
    """The outlink chain must stay whole-stage-codegen'd column algebra:
    no Python eval node, and the ONLY exchange is the edge distinct."""
    from deepex_spark.operators.urls import extract_outlinks

    pages = spark.read.parquet("fixtures/pages_links.parquet")
    plan = _executed(extract_outlinks(pages))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # one hash-partitioned exchange for the distinct (AQE may add reads,
    # not extra shuffles)
    assert plan.count("Exchange hashpartitioning") == 1
