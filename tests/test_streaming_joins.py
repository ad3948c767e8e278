"""Stream-stream and stream-static joins (streaming/joins.py).

The batch body's VALUES are pinned cross-engine by the
``events_attribution`` oracle; these tests cover the streaming
machinery: watermarked stream-stream join == batch join on the same
rows, window-boundary semantics, and the broadcast stream-static
enrich."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from deepex_spark.streaming.joins import (
    attribute_conversions,
    enrich_with_dim,
    stream_attribute_conversions,
)

SCHEMA = "event_id long, ts timestamp_ntz, user_id long"
T0 = datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes=0, seconds=0, micros=0):
    return T0 + timedelta(minutes=minutes, seconds=seconds, microseconds=micros)


IMPRESSIONS = [
    (1, _m(0), 1),          # matches conv 101 (same instant) and 102 (+29m)
    (2, _m(5), 1),          # matches conv 102
    (3, _m(0), 2),          # conv 103 is exactly 30m later -> expired (strict >)
    (4, _m(0, 0, 1), 2),    # 1us inside the window -> matches 103
    (5, _m(50), 3),         # no conversion for user 3
]
CONVERSIONS = [
    (101, _m(0), 1),
    (102, _m(29), 1),
    (103, _m(30), 2),
    (104, _m(10), 99),      # no impression for user 99
]
EXPECTED = {(1, 101), (1, 102), (2, 102), (4, 103)}


def _batch(spark):
    return attribute_conversions(
        spark.createDataFrame(IMPRESSIONS, SCHEMA),
        spark.createDataFrame(CONVERSIONS, SCHEMA),
        window="30 minutes",
    )


def test_batch_window_boundaries(spark):
    got = {(r["imp_event_id"], r["conv_event_id"]) for r in _batch(spark).collect()}
    assert got == EXPECTED


def test_stream_stream_equals_batch(spark, tmp_path):
    imp_dir, conv_dir = str(tmp_path / "imp"), str(tmp_path / "conv")
    spark.createDataFrame(IMPRESSIONS, SCHEMA).coalesce(1).write.parquet(imp_dir)
    spark.createDataFrame(CONVERSIONS, SCHEMA).coalesce(1).write.parquet(conv_dir)
    out = stream_attribute_conversions(
        spark.readStream.schema(SCHEMA).parquet(imp_dir),
        spark.readStream.schema(SCHEMA).parquet(conv_dir),
        window="30 minutes",
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["imp_event_id"], r["conv_event_id"], r["imp_ts"], r["conv_ts"])
        for r in spark.sql("SELECT * FROM attr_stream").collect()
    }
    batch = {
        (r["imp_event_id"], r["conv_event_id"], r["imp_ts"], r["conv_ts"])
        for r in _batch(spark).collect()
    }
    assert got == batch and {(i, c) for i, c, *_ in got} == EXPECTED
    # NTZ round trip preserved the wall-clock event times exactly
    assert {t for _, _, t, _ in got} <= {ts for _, ts, _ in IMPRESSIONS}


def test_stream_static_enrich(spark, tmp_path):
    src = str(tmp_path / "ev")
    spark.createDataFrame(IMPRESSIONS, SCHEMA).coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [(1, "paid"), (2, "organic")], "user_id long, channel string"
    )
    out = enrich_with_dim(spark.readStream.schema(SCHEMA).parquet(src), dim, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT event_id, channel FROM enriched").collect()
    got = {(r["event_id"], r["channel"]) for r in rows}
    # inner join drops user 3 (no dim row); users 1/2 map to their channel
    assert got == {(1, "paid"), (2, "paid"), (3, "organic"), (4, "organic")}
