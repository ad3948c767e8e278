"""Stateful streaming dedup: emits each (docid, triple_key) once across
micro-batches AND across query restarts (state store checkpoint)."""

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

TRIPLES_SCHEMA = StructType(
    [
        StructField("docid", StringType()),
        StructField("triple_key", StringType()),
        StructField("score", DoubleType()),
    ]
)


def _run_phase(spark, src, out, chk):
    from deepex_spark.streaming.stateful import dedup_new_triples

    stream = (
        spark.readStream.schema(TRIPLES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dedup_new_triples(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stateful_dedup_across_batches_and_restarts(spark, tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    chk = tmp_path / "chk"
    src.mkdir()

    import pandas as pd

    cols = ["docid", "triple_key", "score"]
    b1 = [("d1", "A [SEP] r [SEP] B", 0.9), ("d1", "A [SEP] r [SEP] C", 0.8),
          ("d2", "X [SEP] r [SEP] Y", 0.7)]
    pd.DataFrame(b1, columns=cols).to_parquet(src / "f1.parquet", index=False)
    _run_phase(spark, src, out, chk)
    got1 = {(r["docid"], r["triple_key"]) for r in spark.read.parquet(str(out)).collect()}
    assert got1 == {("d1", "A [SEP] r [SEP] B"), ("d1", "A [SEP] r [SEP] C"),
                    ("d2", "X [SEP] r [SEP] Y")}

    # phase 2: new files arrive — one duplicate of d1, one new triple for
    # d1, one new doc. Restarting the query recovers the seen-set from the
    # state store, so the duplicate is NOT re-emitted.
    b2 = [("d1", "A [SEP] r [SEP] B", 0.95),  # dup (different score!)
          ("d1", "A [SEP] r [SEP] D", 0.6),   # new
          ("d3", "P [SEP] r [SEP] Q", 0.5)]   # new doc
    pd.DataFrame(b2, columns=cols).to_parquet(src / "f2.parquet", index=False)
    _run_phase(spark, src, out, chk)
    rows = spark.read.parquet(str(out)).collect()
    got2 = {(r["docid"], r["triple_key"]) for r in rows}
    assert got2 == got1 | {("d1", "A [SEP] r [SEP] D"), ("d3", "P [SEP] r [SEP] Q")}
    # the duplicate emitted exactly once (phase-1 copy, score 0.9)
    dup = [r for r in rows if r["triple_key"] == "A [SEP] r [SEP] B"]
    assert len(dup) == 1 and abs(dup[0]["score"] - 0.9) < 1e-9
