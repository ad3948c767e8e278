"""Graph materialization: deduplicated edge/vertex tables with lineage.

The north_rule's final stage: canonicalized triples -> ``vertices``
(one row per canonical entity, stable 64-bit id) and ``edges`` (one row per
(src, dst, predicate), evidence aggregated). Every row carries lineage
columns (run_id, src_partition, n_source_docs) so a partition can be traced
back and recomputed; write-side partitioning is by ``pmod(edge/vertex id,
n_buckets)`` — uniform, stable, and pruning-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_vertices(canon_triples: DataFrame, run_id: str = "run0") -> DataFrame:
    subj = canon_triples.select(
        F.col("subj_id").alias("entity_id"),
        F.col("subj_canon").alias("canonical"),
        F.col("subj").alias("surface"),
        F.col("docid"),
    )
    obj = canon_triples.select(
        F.col("obj_id").alias("entity_id"),
        F.col("obj_canon").alias("canonical"),
        F.col("obj").alias("surface"),
        F.col("docid"),
    )
    return (
        subj.unionByName(obj)
        .groupBy("entity_id", "canonical")
        .agg(
            F.countDistinct("docid").alias("n_docs"),
            F.count("*").alias("n_mentions"),
            F.array_sort(F.collect_set("surface")).alias("surfaces"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("src_partition", F.spark_partition_id())
    )


def build_edges(canon_triples: DataFrame, run_id: str = "run0") -> DataFrame:
    return (
        canon_triples.groupBy("subj_id", "obj_id", "pred_id", "pred_canon")
        .agg(
            F.count("*").alias("n_evidence"),
            F.countDistinct("docid").alias("n_docs"),
            F.round(F.max("score"), 9).alias("max_score"),
            F.round(F.sum("score"), 9).alias("sum_score"),
            F.min("docid").alias("sample_docid"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("src_partition", F.spark_partition_id())
    )


def materialize_graph(canon_triples: DataFrame, catalog, run_id: str = "run0"):
    """Write vertices/edges via the catalog (Iceberg or parquet shim),
    bucketed by entity/edge id for pruning + balanced layout."""
    v = build_vertices(canon_triples, run_id).withColumn(
        "bucket", F.pmod(F.col("entity_id"), F.lit(32)).cast("int")
    )
    e = build_edges(canon_triples, run_id).withColumn(
        "bucket", F.pmod(F.xxhash64("subj_id", "obj_id", "pred_id"), F.lit(32)).cast("int")
    )
    catalog.write(v, "vertices", partition_by=["bucket"])
    catalog.write(e, "edges", partition_by=["bucket"])
    return v, e
