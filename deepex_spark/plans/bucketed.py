"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The catalog's directory buckets (``plans/catalog.py``) give resume
granularity and partition pruning; THIS module is the other bucketing —
Hive-style ``bucketBy`` table layout, where rows are hash-clustered into
a fixed number of files per table at WRITE time. Two tables bucketed by
the same key and bucket count join with NO exchange on either side: the
scan's output partitioning already satisfies the join's distribution
requirement, so Spark plans a SortMergeJoin directly over the bucket
files (pinned by tests/test_bucketed.py, which asserts zero
``Exchange hashpartitioning`` nodes in the executed plan).

At 100 TB this is the difference between re-shuffling the fact table on
every join and paying the shuffle ONCE at ingest: a kg-edges table
bucketed by entity id joins vertices, aliases, and incremental deltas
shuffle-free forever after. ``sortBy`` within buckets additionally lets
the merge join skip its per-task sort — but only when every bucket is a
single file (``write_bucketed`` guarantees this via a pre-write
repartition to the bucket hash) and the reader opts in with
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (off by
default since Spark 3.0, SPARK-28595, because multi-file buckets would
force a defensive re-sort anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and optionally
    sorted) by ``key``. ``table`` may be db-qualified (``db.t``).

    The frame is repartitioned to the bucket hash first, so every bucket
    is written by exactly one task — ONE file per bucket instead of
    (writing tasks x buckets) small files, and the condition under which
    Spark trusts the on-disk sort at scan time (a multi-file bucket's
    concatenation is not globally sorted, so the reader would re-sort)."""
    from pyspark.sql import functions as F

    w = (
        df.repartition(n_buckets, F.col(key))
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key, hinted to the
    merge strategy so the plan exercises the exchange-free bucketed path
    (a broadcast would also skip the exchange, but trivially)."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, key, how)
