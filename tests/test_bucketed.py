"""Bucketed-table co-located joins (plans/bucketed.py): the write-once
pre-shuffle must eliminate both exchanges from the join plan."""

import pytest
from pyspark.sql import functions as F

from deepex_spark.plans.bucketed import cobucketed_join, write_bucketed


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bdb_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/warehouse'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_cobucketed_join_has_no_exchange(spark, bucket_db):
    verts = spark.range(500).select(
        F.col("id").alias("entity_id"), (F.col("id") % 7).alias("tag")
    )
    edges = spark.range(2000).select(
        (F.col("id") % 500).alias("entity_id"), F.col("id").alias("edge_id")
    )
    write_bucketed(verts, f"{bucket_db}.verts", "entity_id", n_buckets=8)
    write_bucketed(edges, f"{bucket_db}.edges", "entity_id", n_buckets=8)

    joined = cobucketed_join(spark, f"{bucket_db}.edges", f"{bucket_db}.verts", "entity_id")
    assert joined.count() == 2000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan

    # control: the same join over plain (unbucketed) frames shuffles
    plain = edges.hint("merge").join(verts, "entity_id")
    plain.count()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plain_plan


def test_sorted_buckets_skip_per_task_sort(spark, bucket_db):
    df = spark.range(300).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_bucketed(df, f"{bucket_db}.s1", "k", n_buckets=4, sort=True)
    write_bucketed(df, f"{bucket_db}.s2", "k", n_buckets=4, sort=True)
    # Spark only trusts on-disk bucket sort order behind this flag (off by
    # default since 3.0, SPARK-28595) AND with one file per bucket — which
    # write_bucketed guarantees via its pre-write repartition
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = cobucketed_join(spark, f"{bucket_db}.s1", f"{bucket_db}.s2", "k")
        assert joined.count() == 300
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucket-sorted scans satisfy the merge join's ordering
        # requirement: no Sort node above either scan
        assert "SortMergeJoin" in plan and "Exchange hashpartitioning" not in plan
        assert plan.count("Sort ") == 0
    finally:
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_point_lookup_prunes_to_one_bucket(spark, bucket_db):
    # entity point lookups on a bucketed table read 1/n_buckets of the
    # files. autoBucketedScan (on by default) downgrades a bare filter
    # scan to a regular file scan — bucket PRUNING only happens on the
    # bucketed scan path, so pin it on for the lookup.
    import re

    df = spark.range(1000).select(
        F.col("id").alias("entity_id"), (F.col("id") * 2).alias("v")
    )
    write_bucketed(df, f"{bucket_db}.pl", "entity_id", n_buckets=8)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table(f"{bucket_db}.pl").where(F.col("entity_id") == 421)
        assert [(r["entity_id"], r["v"]) for r in q.collect()] == [(421, 842)]
        plan = q._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and (m.group(1), m.group(2)) == ("1", "8")
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_bucketed_values_match_plain_join(spark, bucket_db):
    verts = spark.range(100).select(F.col("id").alias("entity_id"), (F.col("id") % 3).alias("tag"))
    edges = spark.range(400).select((F.col("id") % 100).alias("entity_id"), F.col("id").alias("e"))
    write_bucketed(verts, f"{bucket_db}.v2", "entity_id", n_buckets=4)
    write_bucketed(edges, f"{bucket_db}.e2", "entity_id", n_buckets=4)
    got = {
        (r["entity_id"], r["e"], r["tag"])
        for r in cobucketed_join(spark, f"{bucket_db}.e2", f"{bucket_db}.v2", "entity_id").collect()
    }
    expect = {(r["entity_id"], r["e"], r["tag"]) for r in edges.join(verts, "entity_id").collect()}
    assert got == expect
