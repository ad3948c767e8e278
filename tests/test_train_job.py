"""spark-submit embedding-training job (jobs/train_embeddings.py):
end-to-end over a tiny edge table, deterministic rebuild, idempotent
run_id publish."""

from pyspark.sql import functions as F


def _edges(spark):
    rows = [
        (1, 11, "p"), (1, 12, "p"), (2, 12, "p"), (2, 13, "p"),
        (3, 13, "q"), (3, 11, "q"), (4, 14, "q"), (4, 11, "q"),
    ]
    return spark.createDataFrame(rows, ["src", "dst", "rel"])


def test_train_job_end_to_end(spark, tmp_path):
    from jobs.train_embeddings import main

    src = tmp_path / "edges"
    _edges(spark).write.parquet(str(src))
    out = tmp_path / "kg"
    main(
        [
            "--input", str(src),
            "--output", str(out),
            "--dim", "3",
            "--epochs", "2",
            "--run-id", "t1",
        ]
    )
    from deepex_spark.plans.catalog import Catalog

    cat = Catalog(str(out))
    emb = cat.read_snapshot(spark, "kg_embeddings")
    assert emb.schema.simpleString() == (
        "struct<side:string,node:bigint,j:int,emb:double>"
    )
    n = emb.count()
    assert n > 0
    # both parameter tables present, every touched node has all dims
    sides = {r["side"] for r in emb.select("side").distinct().collect()}
    assert sides == {"in", "out"}
    per = emb.groupBy("side", "node").count().select("count").distinct()
    assert [r["count"] for r in per.collect()] == [3]


def test_train_job_rebuild_is_identical(spark, tmp_path):
    """Same input + knobs → byte-identical embeddings in a NEW version
    (the determinism claim the job docstring makes), and a repeated
    run_id publishes nothing new (idempotence)."""
    from deepex_spark.plans.catalog import Catalog
    from jobs.train_embeddings import train_embeddings

    src_df = _edges(spark)
    cat = Catalog(str(tmp_path / "kg"))
    r1 = train_embeddings(
        spark, src_df, cat, dim=3, epochs=2, run_id="a"
    )
    r2 = train_embeddings(
        spark, src_df, cat, dim=3, epochs=2, run_id="b"
    )
    assert r2["version"] > r1["version"]
    v1 = sorted(
        map(
            tuple,
            cat.read_snapshot(spark, "kg_embeddings", version=r1["version"])
            .select("side", "node", "j", "emb")
            .collect(),
        )
    )
    v2 = sorted(
        map(
            tuple,
            cat.read_snapshot(spark, "kg_embeddings", version=r2["version"])
            .select("side", "node", "j", "emb")
            .collect(),
        )
    )
    assert v1 == v2
    # idempotent re-publish under an already-applied run_id
    r3 = train_embeddings(
        spark, src_df, cat, dim=3, epochs=2, run_id="b"
    )
    assert r3["version"] == r2["version"]
