"""Temporal KG maintenance: SCD-2 validity intervals from observation logs.

A crawl re-observes the same facts across snapshots (reference scope:
deepex emits per-run triples and leaves history to the consumer —
`scripts/run.py` overwrites `output_dir` per run). At lakehouse scale the
KG needs the standard slowly-changing-dimension treatment instead: per
edge/attribute key, collapse the observation log into non-overlapping
validity intervals [valid_from, valid_to) where the VALUE actually
changed, with the open interval flagged current. This is the temporal
layer over the snapshot catalog (plans/catalog.py keeps table versions;
this keeps row-level history).

Scale design: everything is one window partition key — the entity key.
Both the change-detection lag and the interval lead sort within the same
(key) partitioning, so Catalyst plans ONE exchange and two in-partition
sorts (the second sort is over strictly fewer rows after the run filter).
No self-joins, no driver state; a hot key costs one partition's sort,
never a shuffle explosion.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    obs: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    ts_col: str,
) -> DataFrame:
    """Collapse an observation log into SCD-2 validity intervals.

    ``obs`` rows are (key..., value, ts) observations. Multiple
    observations of the same key at the same ts are collapsed
    deterministically to ``min(value)`` (partition-order invariance: the
    result is a pure function of the observation SET). A new interval
    starts exactly where the deduplicated value differs from the previous
    observation's value; ``valid_to`` is the start of the next interval
    (NULL for the current one).

    Returns (key..., value, valid_from, valid_to, is_current).
    """
    keys = list(key_cols)
    # ONE exchange on the entity key: hashpartitioning(keys) satisfies the
    # ClusteredDistribution of BOTH the (keys, ts) dedup aggregate (subset
    # rule) and the (keys) windows, so everything below runs in-partition.
    # Without this, Catalyst plans a (keys, ts) agg exchange AND a (keys)
    # window exchange — two shuffles of the observation log per fold. The
    # trade: the dedup loses its map-side partial (same-(key, ts)
    # duplicates are rare in a snapshot log), the log crosses the wire
    # once instead of twice.
    per_ts = (
        obs.repartition(*keys)
        .groupBy(*keys, ts_col)
        .agg(F.min(value_col).alias(value_col))
    )
    w = Window.partitionBy(*keys).orderBy(ts_col)
    starts = per_ts.withColumn("_prev", F.lag(value_col).over(w)).where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(value_col))
    )
    return (
        starts.select(
            *keys,
            value_col,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time view of an SCD-2 table: the rows valid AT ``ts``
    (valid_from <= ts < valid_to, open interval = current). A pure
    filter — prunes on valid_from/valid_to min-max parquet stats, no
    shuffle at all."""
    t = F.lit(ts)
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
