"""Structured Streaming ingest of crawl batches (SURVEY.md §7.1 M7 note).

The reference is strictly batch; this is the Spark-native extension for
continuous crawls: new page files land in a directory (or Kafka topic /
Iceberg incremental scan at scale), each micro-batch runs the SAME batch
pipeline via ``foreachBatch`` (one code path, batch == stream), with
``Trigger.AvailableNow`` for catch-up runs and checkpointed offsets for
exactly-once sink appends.

``windowed_event_counts`` covers the watermark/window/late-data checklist:
event-time tumbling counts with a watermark bounding state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepex_spark.config import DeepExConfig
from deepex_spark.sources.pages import PAGES_SCHEMA


def read_page_stream(spark: SparkSession, input_dir: str, fmt: str = "parquet") -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .format(fmt)
        .load(input_dir)
    )


def stream_extract(
    pages_stream: DataFrame,
    cfg: DeepExConfig,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    derive_text: bool = False,
):
    """Run the full batch pipeline per micro-batch; returns the query.
    ``derive_text`` renders the text column from raw html at ingest —
    the streaming twin of ``build_kg --derive-text`` (same row-local
    html_to_text chain, one code path batch == stream)."""
    from deepex_spark.operators.urls import html_to_text
    from deepex_spark.pipeline import extract_triples

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if derive_text:
            batch_df = batch_df.withColumn(
                "text", html_to_text(F.col("html"))
            )
        (
            extract_triples(batch_df, cfg)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        pages_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling window counts; late rows beyond the watermark
    are dropped and state is bounded — the standard late-data contract."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
