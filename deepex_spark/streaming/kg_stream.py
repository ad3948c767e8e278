"""Streaming KG maintenance: fold triple micro-batches into the snapshot
catalog with exactly-once semantics.

A continuous crawl emits extracted triples as they land;
``jobs/maintain_kg.py`` folds them batch-by-batch when someone runs it.
This module is the always-on variant: a Structured Streaming query whose
``foreachBatch`` sink aggregates each micro-batch into the edge-table
schema and merges it into the live snapshot through the SAME production
fold (``operators/graph.py::merge_edges``) and the SAME idempotent
publish (``plans/catalog.py::write_snapshot``).

Exactly-once without a transactional sink: the streaming checkpoint
makes batch ids + contents deterministic on replay (source offsets are
committed only after ``foreachBatch`` returns), and the publish is
idempotent per ``run_id = <prefix>-<batch_id>`` — after a crash BETWEEN
the merge landing and the offset commit, the re-run re-executes the same
batch id, ``write_snapshot`` finds the run_id inside its publish lock,
and skips the re-merge. The classic double-apply is structurally
impossible; tests/test_streaming_kg.py replays a batch to prove it.

Correctness contract (same as jobs/maintain_kg.py): batches must be
doc-disjoint — each docid's triples arrive in exactly one micro-batch
(true for a crawl where a docid is emitted once; re-crawls go through
the streaming dedup in streaming/stateful.py first). Under it,
fold(fold(S0, A), B) == build(A ∪ B) for every edge statistic, which is
what the test asserts against a single-shot batch build.

No reference counterpart (the reference is strictly batch); this is the
Structured-Streaming extension of the O34 sink + maintain_kg merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_edges(triples: DataFrame) -> DataFrame:
    """Aggregate one micro-batch of (docid, subj, rel, obj, score) rows
    into the merge_edges schema. Scores are rounded to 9 dp exactly as
    ``operators/graph.py::build_edges`` does, so streamed folds and
    batch rebuilds agree to the documented tolerance."""
    return triples.groupBy(
        F.col("subj").alias("subj_id"),
        F.col("obj").alias("obj_id"),
        F.col("rel").alias("pred_id"),
        F.col("rel").alias("pred_canon"),
    ).agg(
        F.count("*").alias("n_evidence"),
        F.countDistinct("docid").alias("n_docs"),
        F.round(F.max("score"), 9).alias("max_score"),
        F.round(F.sum("score"), 9).alias("sum_score"),
        F.min("docid").alias("sample_docid"),
    )


def fold_batch(catalog, table: str, run_prefix: str = "stream"):
    """Return the ``foreachBatch`` function closing over the catalog.

    Exposed separately so tests (and a crash-recovery operator) can
    replay a (df, batch_id) pair directly and observe the idempotent
    skip."""
    from deepex_spark.operators.graph import merge_edges

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"{run_prefix}-{batch_id}"
        spark = batch_df.sparkSession
        delta = batch_edges(batch_df)
        if catalog.is_versioned(table):
            if catalog.version_of_run(table, run_id) is not None:
                return  # replayed batch: already published, skip the work
            # the published snapshot carries lineage columns the fresh
            # delta doesn't — strip them so the unionByName inside
            # merge_edges sees two identical stat schemas (merge re-stamps
            # run_id/src_partition on the way out)
            existing = catalog.read_snapshot(spark, table).drop(
                "run_id", "src_partition"
            )
            merged = merge_edges(existing, delta, run_id=run_id)
        else:
            merged = delta.withColumn("run_id", F.lit(run_id)).withColumn(
                "src_partition", F.spark_partition_id()
            )
        catalog.write_snapshot(merged, table, run_id=run_id)

    return fold


def stream_kg_maintenance(
    triples_stream: DataFrame,
    catalog,
    table: str,
    checkpoint_dir: str,
    run_prefix: str = "stream",
    available_now: bool = True,
):
    """Wire a streaming triples DataFrame into the catalog fold and
    return the started ``StreamingQuery``. ``available_now=True`` drains
    whatever has landed and stops (the cron-style incremental run);
    ``False`` runs continuously with the default trigger."""
    writer = (
        triples_stream.writeStream.foreachBatch(fold_batch(catalog, table, run_prefix))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
