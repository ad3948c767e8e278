"""Streaming KG maintenance (streaming/kg_stream.py): micro-batch folds
into the snapshot catalog equal the single-shot batch build, survive a
restart (checkpoint offsets), and never double-apply a replayed batch
(idempotent run_id publish)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRIPLES_SCHEMA = StructType(
    [
        StructField("docid", LongType()),
        StructField("subj", StringType()),
        StructField("rel", StringType()),
        StructField("obj", StringType()),
        StructField("score", DoubleType()),
    ]
)

BATCH_A = [
    (1, "alan", "born_in", "london", 2.0),
    (1, "alan", "born_in", "london", 1.0),  # same doc, same edge
    (2, "alan", "born_in", "london", 4.0),  # second doc, same edge
    (2, "ada", "wrote", "notes", 3.0),
]
BATCH_B = [
    (3, "alan", "born_in", "london", 8.0),
    (3, "ada", "wrote", "notes", 1.0),
    (4, "grace", "built", "compiler", 5.0),
]


def _write_batch(spark, src, rows, name):
    spark.createDataFrame(rows, TRIPLES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    # one file per phase is enough; availableNow drains all present files


def _drain(spark, src, chk, catalog, table):
    from deepex_spark.streaming.kg_stream import stream_kg_maintenance

    stream = (
        spark.readStream.schema(TRIPLES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_kg_maintenance(stream, catalog, table, str(chk))
    q.awaitTermination(180)
    q.stop()


def _edges(spark, catalog, table):
    df = catalog.read_snapshot(spark, table)
    return {
        (r.subj_id, r.obj_id, r.pred_canon): (
            r.n_evidence,
            r.n_docs,
            r.max_score,
            r.sum_score,
            r.sample_docid,
        )
        for r in df.collect()
    }


def _batch_build(spark, rows):
    from deepex_spark.streaming.kg_stream import batch_edges

    df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    return {
        (r.subj_id, r.obj_id, r.pred_canon): (
            r.n_evidence,
            r.n_docs,
            r.max_score,
            r.sum_score,
            r.sample_docid,
        )
        for r in batch_edges(df).collect()
    }


def test_stream_fold_equals_batch_build_across_restart(spark, tmp_path):
    from deepex_spark.plans.catalog import Catalog

    src, chk = tmp_path / "in", tmp_path / "chk"
    os.makedirs(src, exist_ok=True)
    catalog = Catalog(str(tmp_path / "wh"), spark=spark)

    _write_batch(spark, src, BATCH_A, "a")
    _drain(spark, src, chk, catalog, "edges")
    assert _edges(spark, catalog, "edges") == _batch_build(spark, BATCH_A)

    # restart: NEW query, same checkpoint — only batch B is folded
    _write_batch(spark, src, BATCH_B, "b")
    _drain(spark, src, chk, catalog, "edges")
    assert _edges(spark, catalog, "edges") == _batch_build(
        spark, BATCH_A + BATCH_B
    )


def test_replayed_batch_is_not_double_applied(spark, tmp_path):
    """Simulate the crash window between snapshot publish and offset
    commit: call the foreachBatch fold directly with the SAME batch_id
    twice — the second call must neither re-merge nor publish a new
    version."""
    from deepex_spark.plans.catalog import Catalog
    from deepex_spark.streaming.kg_stream import fold_batch

    catalog = Catalog(str(tmp_path / "wh"), spark=spark)
    fold = fold_batch(catalog, "edges", run_prefix="t")
    df = spark.createDataFrame(BATCH_A, TRIPLES_SCHEMA)

    fold(df, 0)
    v_after_first = catalog.version_of_run("edges", "t-0")
    before = _edges(spark, catalog, "edges")
    fold(df, 0)  # replay
    assert catalog.version_of_run("edges", "t-0") == v_after_first
    assert _edges(spark, catalog, "edges") == before

    # a genuinely new batch still folds
    fold(spark.createDataFrame(BATCH_B, TRIPLES_SCHEMA), 1)
    assert _edges(spark, catalog, "edges") == _batch_build(
        spark, BATCH_A + BATCH_B
    )
