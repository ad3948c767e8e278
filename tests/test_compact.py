"""Catalog small-file compaction (plans/catalog.py::compact)."""

from pyspark.sql import functions as F

from deepex_spark.plans.catalog import Catalog


def _file_count(path):
    import os

    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def test_compact_bucketed_table(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df = spark.range(2000).select(
        F.col("id").alias("docid"), (F.col("id") * 3).alias("score")
    )
    # three appends x 8 writing tasks -> many small files per bucket
    for i in range(3):
        cat.write(
            df.withColumn("batch", F.lit(i))
            .repartition(8)
            .withColumn("bucket", F.pmod(F.xxhash64("docid"), F.lit(4)).cast("int")),
            "t",
            mode="append" if i else "overwrite",
            partition_by=["bucket"],
        )
    before_files = _file_count(cat.path("t"))
    before = cat.read(spark, "t")
    before_rows = before.count()
    before_sum = before.agg(F.sum("score")).collect()[0][0]
    assert before_files > 4  # genuinely fragmented

    report = cat.compact(spark, "t")
    after = cat.read(spark, "t")
    assert after.count() == before_rows
    assert after.agg(F.sum("score")).collect()[0][0] == before_sum
    assert _file_count(cat.path("t")) == 4  # one file per bucket at target
    assert set(after.columns) == set(before.columns)  # bucket col preserved
    assert all(b > a for b, a in report.values()) and len(report) == 4

    # idempotent: second run is a no-op
    assert cat.compact(spark, "t") == {}


def test_compact_unpartitioned_table(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df = spark.range(500).select(F.col("id").alias("k"))
    cat.write(df.repartition(6), "u")
    cat.write(df.repartition(6), "u", mode="append")
    assert _file_count(cat.path("u")) == 12
    report = cat.compact(spark, "u")
    assert report == {".": (12, 1)}
    assert cat.read(spark, "u").count() == 1000
