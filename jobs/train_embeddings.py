"""spark-submit entry point: train KG node embeddings from an edge table
and publish them as a catalog snapshot.

    zip -r deepex_spark.zip deepex_spark
    spark-submit --py-files deepex_spark.zip jobs/train_embeddings.py \\
        --input /warehouse/kg/edges --output /warehouse/kg \\
        --dim 16 --epochs 3 --lr 0.5 --walk-len 4 --run-id emb1

Pipeline (every stage is the oracle-verified operator the registered
queries run): deterministic DeepWalk corpus over the symmetrized edges
(graph.py::random_walks — the neighbor pick is a pure hash of
(start, step, current), so the corpus is partition-invariant and a
rebuild is byte-identical), skip-gram window pairs with multiplicities,
type-consistent negative corruption within each relation, then
``--epochs`` exact full-batch skip-gram epochs (kgq.py::skipgram_epoch
for epoch 1 — join-free, hash-init parameters — and
skipgram_epoch_from_table for the rest — node-keyed parameter joins).
The fast-sigmoid link and 1e9-quantized integer gradient sums make
every epoch bit-reproducible across cluster sizes, which is what makes
the idempotent run_id publish meaningful: same input, same knobs, same
bytes.

Publishes ``kg_embeddings (side, node, j, emb)`` through the snapshot
catalog; previous versions stay readable while the new one lands.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def train_embeddings(
    spark,
    edges,
    catalog,
    dim: int = 8,
    epochs: int = 2,
    lr: float = 0.5,
    walk_len: int = 4,
    window: int = 2,
    pos_weight: int = 1,
    n_walks: int = 1,
    run_id: str = "emb0",
):
    """Walks → pairs → negatives → epochs → snapshot; returns a report
    dict. ``edges`` needs (src, dst) plus rel for type-consistent
    negatives (a constant pseudo-relation is used when absent — the
    corruption then draws from the global object set)."""
    from pyspark.sql import functions as F

    from deepex_spark.operators.graph import negative_samples, random_walks
    from deepex_spark.operators.kgq import (
        hash_embedding,
        skipgram_epoch,
        skipgram_epoch_from_table,
    )

    if "rel" not in edges.columns:
        edges = edges.withColumn("rel", F.lit("_all"))
    walks = random_walks(
        edges.select("src", "dst"), walk_len=walk_len, n_walks=n_walks
    )
    a, b = walks.alias("a"), walks.alias("b")
    same_walk = F.col("a.start") == F.col("b.start")
    if n_walks > 1:
        same_walk = same_walk & (F.col("a.wk") == F.col("b.wk"))
    pairs = (
        a.join(
            b,
            same_walk
            & (F.col("b.step") - F.col("a.step")).between(1, window),
        )
        .groupBy(F.col("a.v").alias("center"), F.col("b.v").alias("context"))
        .agg((F.count("*") * pos_weight).alias("n_pairs"))
    )
    pos_triples = edges.select(
        F.col("src").alias("subj"), "rel", F.col("dst").alias("obj")
    ).distinct()
    neg = negative_samples(pos_triples).select(
        F.col("subj").alias("center"), F.col("neg_obj").alias("context")
    )
    emb = skipgram_epoch(
        pairs, neg, hash_embedding("e"), hash_embedding("c"), dim=dim, lr=lr
    )
    for _ in range(1, epochs):
        emb = skipgram_epoch_from_table(pairs, neg, emb, dim=dim, lr=lr)
    version = catalog.write_snapshot(emb, "kg_embeddings", run_id=run_id)
    rows = catalog.read_snapshot(spark, "kg_embeddings").count()
    return {
        "table": "kg_embeddings",
        "version": version,
        "rows": rows,
        "epochs": epochs,
        "dim": dim,
        "n_walks": n_walks,
    }


def refresh_embeddings(
    spark,
    delta_edges,
    catalog,
    dim: int = 8,
    epochs: int = 1,
    lr: float = 0.5,
    walk_len: int = 4,
    window: int = 2,
    pos_weight: int = 1,
    n_walks: int = 1,
    run_id: str = "embd0",
):
    """Incremental refresh: train ``epochs`` on pairs derived from the
    DELTA edge batch only, reading parameters from the current
    ``kg_embeddings`` snapshot and folding the updated rows back —
    untouched parameters pass through byte-identically. The walk corpus
    is confined to the delta subgraph, so this is a documented
    approximation of a full retrain (the same fold-vs-rebuild split as
    jobs/maintain_kg.py: deltas fold cheaply, a periodic full
    train_embeddings run is the consolidation path). Cost scales with
    the delta, not the graph: the epoch touches only delta-adjacent
    (side, node, j) keys, and the fold is one left-anti join on them."""
    from pyspark.sql import functions as F

    from deepex_spark.operators.graph import negative_samples, random_walks
    from deepex_spark.operators.kgq import skipgram_epoch_from_table

    current = catalog.read_snapshot(spark, "kg_embeddings")
    if "rel" not in delta_edges.columns:
        delta_edges = delta_edges.withColumn("rel", F.lit("_all"))
    walks = random_walks(
        delta_edges.select("src", "dst"), walk_len=walk_len, n_walks=n_walks
    )
    a, b = walks.alias("a"), walks.alias("b")
    same_walk = F.col("a.start") == F.col("b.start")
    if n_walks > 1:
        same_walk = same_walk & (F.col("a.wk") == F.col("b.wk"))
    pairs = (
        a.join(
            b,
            same_walk
            & (F.col("b.step") - F.col("a.step")).between(1, window),
        )
        .groupBy(F.col("a.v").alias("center"), F.col("b.v").alias("context"))
        .agg((F.count("*") * pos_weight).alias("n_pairs"))
    )
    pos_triples = delta_edges.select(
        F.col("src").alias("subj"), "rel", F.col("dst").alias("obj")
    ).distinct()
    neg = negative_samples(pos_triples).select(
        F.col("subj").alias("center"), F.col("neg_obj").alias("context")
    )
    emb = current
    for _ in range(epochs):
        emb = skipgram_epoch_from_table(pairs, neg, emb, dim=dim, lr=lr)
    touched = emb.select("side", "node", "j")
    folded = emb.unionByName(
        current.join(touched, ["side", "node", "j"], "left_anti")
    )
    version = catalog.write_snapshot(folded, "kg_embeddings", run_id=run_id)
    return {
        "table": "kg_embeddings",
        "version": version,
        "rows": catalog.read_snapshot(spark, "kg_embeddings").count(),
        "touched": touched.count(),
        "epochs": epochs,
        "dim": dim,
        "n_walks": n_walks,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="edge parquet/table (src, dst[, rel])")
    p.add_argument("--output", required=True, help="catalog base dir")
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.5)
    p.add_argument("--walk-len", type=int, default=4)
    p.add_argument("--window", type=int, default=2)
    p.add_argument("--pos-weight", type=int, default=1,
                   help="positive-pair gradient weight multiplier")
    p.add_argument("--n-walks", type=int, default=1,
                   help="walks per vertex (corpus coverage knob)")
    p.add_argument("--run-id", default="emb0")
    p.add_argument(
        "--delta",
        action="store_true",
        help="treat --input as a delta edge batch: train on its pairs "
        "only, reading the current kg_embeddings snapshot and folding "
        "updated parameters back (incremental refresh; run a full "
        "train periodically to consolidate)",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from deepex_spark.plans.catalog import Catalog
    from deepex_spark.session import build_session

    preexisting = SparkSession.getActiveSession() is not None
    spark = build_session(app_name=f"deepex-emb-{args.run_id}")
    catalog = Catalog(args.output)
    edges = spark.read.parquet(args.input)
    t0 = time.time()
    fn = refresh_embeddings if args.delta else train_embeddings
    report = fn(
        spark, edges, catalog,
        dim=args.dim, epochs=args.epochs, lr=args.lr,
        walk_len=args.walk_len, window=args.window,
        pos_weight=args.pos_weight, n_walks=args.n_walks,
        run_id=args.run_id,
    )
    report["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    if not preexisting:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
