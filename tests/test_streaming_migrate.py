"""Checkpoint migration: a REAL pre-bloom (round-2 ``seen array<long>``
schema) checkpoint is written by an old-schema query, exported through the
public statestore reader, and restored into a fresh-checkpoint new-schema
query via seed rows — previously-emitted triples stay suppressed even
though the new query re-reads the source from scratch.
"""

import pandas as pd
import pytest
from pyspark.sql.streaming.state import GroupStateTimeout

TRIPLES_DDL = "docid string, triple_key string, score double"
COLS = ["docid", "triple_key", "score"]


def _make_old_schema_dedup_fn():
    """The round-2 dedup function, verbatim semantics: state is
    ``seen array<long>`` ONLY (no bloom field). Built inside a factory so
    cloudpickle serializes it BY VALUE (a module-level test function would
    pickle by reference and fail to import on executor workers)."""

    def old_fn(key, pdfs, state):
        import pandas as _pd

        from deepex_spark.streaming.stateful import _fp

        seen = set(state.get[0]) if state.exists else set()
        rows = []
        for pdf in pdfs:
            for k, s in zip(pdf["triple_key"], pdf["score"]):
                f = _fp(k)
                if f not in seen:
                    seen.add(f)
                    rows.append((key[0], k, float(s)))
        state.update((list(seen),))
        if rows:
            yield _pd.DataFrame(rows, columns=["docid", "triple_key", "score"])

    return old_fn


def _await(q):
    q.awaitTermination(180)
    q.stop()


def test_migrate_prebloom_checkpoint(spark, tmp_path):
    src = tmp_path / "in"
    out_old = tmp_path / "out_old"
    chk_old = tmp_path / "chk_old"
    src.mkdir()

    # --- phase 1: the OLD query (pre-bloom schema) emits batch-1 triples
    b1 = [
        ("d1", "A [SEP] r [SEP] B", 0.9),
        ("d1", "A [SEP] r [SEP] C", 0.8),
        ("d2", "X [SEP] r [SEP] Y", 0.7),
    ]
    pd.DataFrame(b1, columns=COLS).to_parquet(src / "f1.parquet", index=False)
    stream = spark.readStream.schema(TRIPLES_DDL).parquet(str(src))
    q = (
        stream.groupBy("docid")
        .applyInPandasWithState(
            _make_old_schema_dedup_fn(),
            outputStructType=TRIPLES_DDL,
            stateStructType="seen array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.format("parquet")
        .option("path", str(out_old))
        .option("checkpointLocation", str(chk_old))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    emitted_old = {
        (r["docid"], r["triple_key"])
        for r in spark.read.parquet(str(out_old)).collect()
    }
    assert emitted_old == {(d, k) for d, k, _ in b1}

    # --- sanity: the NEW schema cannot resume this checkpoint directly
    # (that incompatibility is exactly what the migrator services); Spark
    # surfaces it as a state-schema validation failure on the first batch.

    # --- phase 2: migrate — export state, seed a fresh-checkpoint query
    from deepex_spark.streaming.migrate import export_prebloom_state, seeded_stream
    from deepex_spark.streaming.stateful import dedup_new_triples

    seed_path = str(tmp_path / "seed")
    n = export_prebloom_state(spark, str(chk_old), seed_path)
    assert n == 2  # d1, d2
    seed = spark.read.parquet(seed_path)
    assert {r["docid"] for r in seed.collect()} == {"d1", "d2"}
    assert all(len(r["seen"]) in (1, 2) for r in seed.collect())

    # new data arrives alongside: one duplicate of an OLD triple (emitted
    # before the migration), one new triple, one new doc
    b2 = [
        ("d1", "A [SEP] r [SEP] B", 0.95),  # dup of pre-migration emission
        ("d1", "A [SEP] r [SEP] D", 0.6),   # new
        ("d3", "P [SEP] r [SEP] Q", 0.5),   # new doc
    ]
    pd.DataFrame(b2, columns=COLS).to_parquet(src / "f2.parquet", index=False)

    out_new = tmp_path / "out_new"
    chk_new = tmp_path / "chk_new"
    source = spark.readStream.schema(TRIPLES_DDL).parquet(str(src))
    q = (
        dedup_new_triples(seeded_stream(spark, source, seed_path))
        .writeStream.format("parquet")
        .option("path", str(out_new))
        .option("checkpointLocation", str(chk_new))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)

    rows = spark.read.parquet(str(out_new)).collect()
    got = {(r["docid"], r["triple_key"]) for r in rows}
    # the new query re-read f1 AND f2 from scratch, but every triple the
    # old query had emitted is suppressed by the migrated state — only the
    # genuinely new ones flow
    assert got == {("d1", "A [SEP] r [SEP] D"), ("d3", "P [SEP] r [SEP] Q")}, got
    assert len(rows) == 2


def test_seed_rows_do_not_leak_into_output(spark, tmp_path):
    """A seeded stream whose source is EMPTY emits nothing (seed rows are
    state-only), and the seeded state persists into later batches."""
    from deepex_spark.streaming.migrate import seeded_stream
    from deepex_spark.streaming.stateful import _fp, dedup_new_triples

    src = tmp_path / "in"
    src.mkdir()
    seed_dir = tmp_path / "seed"
    seed_dir.mkdir()  # the streaming file source needs a DIRECTORY
    seed_path = str(seed_dir)
    pd.DataFrame(
        {"docid": ["d9"], "seen": [[_fp("K [SEP] r [SEP] L")]]}
    ).to_parquet(seed_dir / "part0.parquet")

    out = tmp_path / "out"
    chk = tmp_path / "chk"

    def run():
        source = spark.readStream.schema(TRIPLES_DDL).parquet(str(src))
        q = (
            dedup_new_triples(seeded_stream(spark, source, seed_path))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(chk))
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    run()
    try:
        n0 = spark.read.parquet(str(out)).count()
    except Exception:  # no files written at all is also "no rows"
        n0 = 0
    assert n0 == 0

    # restart with data: the seeded fingerprint suppresses its triple
    pd.DataFrame(
        [("d9", "K [SEP] r [SEP] L", 1.0), ("d9", "M [SEP] r [SEP] N", 0.5)],
        columns=COLS,
    ).to_parquet(src / "f1.parquet", index=False)
    run()
    got = {
        (r["docid"], r["triple_key"]) for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {("d9", "M [SEP] r [SEP] N")}
