"""One-off migration of pre-bloom streaming-dedup checkpoints.

``stateful.STATE_SCHEMA`` gained the ``bloom binary`` field in round 3; a
query restarted from a checkpoint written under the round-2 schema
(``seen array<long>`` only) fails Spark's state-schema compatibility check
(and would misread UnsafeRow state if the check were disabled). The state
files themselves are an internal format, so instead of rewriting deltas in
place this migrator uses only public APIs:

1. :func:`export_prebloom_state` — a BATCH job: read the old checkpoint's
   final state through the State Data Source (``spark.read.format(
   "statestore")``, public since Spark 4.0) and write a seed table
   ``(docid, seen array<long>)`` to parquet. Run this AFTER stopping the
   old query (the reader serves the latest committed snapshot).
2. :func:`seeded_stream` — build the input for the NEW query: the real
   source unioned with a one-shot file-stream of the seed table, each row
   carrying the fingerprints in a ``seed_fps`` column (``triple_key`` =
   null). The seed files exist before the query starts, so the default
   file source folds them into the FIRST micro-batch; the dedup function
   (``stateful._make_dedup_fn``) absorbs ``seed_fps`` rows into state
   BEFORE deduping that batch's data rows for the same docid.
3. Start ``dedup_new_triples`` on the seeded stream at a FRESH checkpoint
   location, writing to the same sink.

Because the new state is seeded with every fingerprint the old query had
emitted, re-processing the source from scratch is idempotent: previously
emitted (docid, triple) edges are suppressed, new ones flow. Seeds respect
the same state bound as live traffic — the first ``MAX_EXACT``
fingerprints exactly, the rest into the bloom tail.

No reference counterpart (the reference is strictly batch); this tool
services the engine's own streaming extension. Verified end-to-end by
``tests/test_streaming_migrate.py`` (restores a real round-2-schema
checkpoint through the migrator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# unioned input schema for a seeded dedup stream
SEEDED_INPUT_SCHEMA = (
    "docid string, triple_key string, score double, seed_fps array<long>"
)


def export_prebloom_state(
    spark: SparkSession, old_checkpoint: str, seed_path: str
) -> int:
    """Read the (docid -> seen fingerprints) state of a STOPPED pre-bloom
    dedup query from its checkpoint and write the seed parquet. Returns
    the number of docids exported."""
    state = spark.read.format("statestore").load(old_checkpoint)
    seed = state.select(
        F.col("key.docid").alias("docid"),
        F.col("value.groupState.seen").alias("seen"),
    )
    seed.write.mode("overwrite").parquet(seed_path)
    return spark.read.parquet(seed_path).count()


def seed_rows(spark: SparkSession, seed_path: str) -> DataFrame:
    """The seed table as a STREAMING one-shot source with the unioned
    schema: (docid, null, null, seen-fingerprints)."""
    return (
        spark.readStream.schema("docid string, seen array<long>")
        .parquet(seed_path)
        .select(
            "docid",
            F.lit(None).cast("string").alias("triple_key"),
            F.lit(None).cast("double").alias("score"),
            F.col("seen").alias("seed_fps"),
        )
    )


def seeded_stream(
    spark: SparkSession, source: DataFrame, seed_path: str
) -> DataFrame:
    """Union the real (docid, triple_key, score) stream with the seed
    rows; feed the result to ``dedup_new_triples``."""
    data = source.select(
        "docid",
        "triple_key",
        "score",
        F.lit(None).cast("array<long>").alias("seed_fps"),
    )
    return data.unionByName(seed_rows(spark, seed_path))
