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


def test_refresh_folds_only_delta_nodes(spark, tmp_path):
    """--delta refresh: parameters of nodes outside the delta subgraph
    pass through byte-identically; delta-adjacent parameters change;
    the fold equals a manual from_table epoch + left-anti stitch."""
    from pyspark.sql import functions as F

    from deepex_spark.operators.graph import negative_samples, random_walks
    from deepex_spark.operators.kgq import skipgram_epoch_from_table
    from deepex_spark.plans.catalog import Catalog
    from jobs.train_embeddings import refresh_embeddings, train_embeddings

    cat = Catalog(str(tmp_path / "kg"))
    base = train_embeddings(spark, _edges(spark), cat, dim=3, epochs=1,
                            run_id="full")
    current = cat.read_snapshot(spark, "kg_embeddings", version=base["version"])
    delta = spark.createDataFrame(
        [(1, 99, "p"), (99, 12, "p")], ["src", "dst", "rel"]
    )
    rep = refresh_embeddings(spark, delta, cat, dim=3, epochs=1,
                             run_id="d1")
    folded = cat.read_snapshot(spark, "kg_embeddings",
                               version=rep["version"])
    # manual expectation
    walks = random_walks(delta.select("src", "dst"), walk_len=4)
    a, b = walks.alias("a"), walks.alias("b")
    pairs = (
        a.join(b, (F.col("a.start") == F.col("b.start"))
               & (F.col("b.step") - F.col("a.step")).between(1, 2))
        .groupBy(F.col("a.v").alias("center"), F.col("b.v").alias("context"))
        .agg(F.count("*").alias("n_pairs"))
    )
    neg = negative_samples(
        delta.selectExpr("src AS subj", "rel", "dst AS obj").distinct()
    ).select(F.col("subj").alias("center"), F.col("neg_obj").alias("context"))
    upd = skipgram_epoch_from_table(pairs, neg, current, dim=3, lr=0.5)
    want = sorted(map(tuple, upd.unionByName(
        current.join(upd.select("side", "node", "j"),
                     ["side", "node", "j"], "left_anti")
    ).collect()))
    assert sorted(map(tuple, folded.collect())) == want
    # untouched node (e.g. 4/14 not in delta subgraph) identical
    before = {t[:3]: t[3] for t in map(tuple, current.collect())}
    after = {t[:3]: t[3] for t in map(tuple, folded.collect())}
    touched_nodes = {r["node"] for r in upd.select("node").distinct().collect()}
    untouched = [k for k in before if k[1] not in touched_nodes]
    assert untouched
    for k in untouched:
        assert after[k] == before[k]
    # new node 99 entered the table
    assert any(k[1] == 99 for k in after)
    assert rep["touched"] < len(after)
