"""SCD-2 history semantics (operators/temporal.py).

The registered ``kg_edge_history`` query is hash-verified against a
DuckDB window-SQL re-derivation by the driver; these tests pin the
operator's contract on hand-written edge cases the sf tables may not
cover: same-ts conflicts, value flapping (A→B→A makes THREE intervals),
single-observation keys, and the as_of point-in-time filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deepex_spark.operators.temporal import as_of, scd2_history


def _hist(spark, rows):
    obs = spark.createDataFrame(rows, "k string, v string, ts int")
    out = scd2_history(obs, ["k"], "v", "ts")
    return {
        (r.k, r.valid_from): (r.v, r.valid_to, r.is_current)
        for r in out.collect()
    }


def test_scd2_runs_and_flapping(spark):
    # A..A B A : change-detection collapses runs but A->B->A is 3 intervals
    h = _hist(
        spark,
        [("x", "A", 1), ("x", "A", 2), ("x", "B", 3), ("x", "A", 5)],
    )
    assert h == {
        ("x", 1): ("A", 3, False),
        ("x", 3): ("B", 5, False),
        ("x", 5): ("A", None, True),
    }


def test_scd2_same_ts_conflict_is_deterministic_min(spark):
    # two observations at ts=1 collapse to min(v) BEFORE change detection
    h = _hist(spark, [("x", "B", 1), ("x", "A", 1), ("x", "A", 2)])
    assert h == {("x", 1): ("A", None, True)}


def test_scd2_singleton_key_is_current(spark):
    h = _hist(spark, [("y", "Z", 7)])
    assert h == {("y", 7): ("Z", None, True)}


def test_scd2_partition_order_invariance(spark):
    rows = [("x", "A", 1), ("x", "B", 3), ("z", "C", 2), ("x", "A", 5)]
    obs1 = spark.createDataFrame(rows, "k string, v string, ts int")
    obs2 = spark.createDataFrame(list(reversed(rows)), "k string, v string, ts int").repartition(7)
    a = sorted(map(tuple, scd2_history(obs1, ["k"], "v", "ts").collect()))
    b = sorted(map(tuple, scd2_history(obs2, ["k"], "v", "ts").collect()))
    assert a == b


def test_as_of_point_in_time(spark):
    obs = spark.createDataFrame(
        [("x", "A", 1), ("x", "B", 3), ("x", "C", 6)], "k string, v string, ts int"
    )
    hist = scd2_history(obs, ["k"], "v", "ts")
    # at ts=3 the B interval [3,6) is live; boundary is half-open
    assert [r.v for r in as_of(hist, 3).collect()] == ["B"]
    assert [r.v for r in as_of(hist, 5).collect()] == ["B"]
    assert [r.v for r in as_of(hist, 6).collect()] == ["C"]  # current/open
    assert as_of(hist, 0).count() == 0


def test_scd2_plan_single_exchange(spark):
    """The dedup aggregate, change-detection lag and interval lead all
    key on the same partition columns — the physical plan must contain
    exactly ONE shuffle exchange (reused), or the operator costs 3
    shuffles per snapshot fold at crawl scale."""
    obs = spark.createDataFrame(
        [("x", "A", 1), ("x", "B", 3)], "k string, v string, ts int"
    )
    plan = (
        scd2_history(obs, ["k"], "v", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
