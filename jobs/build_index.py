"""spark-submit entry point: build an IVF-PQ vector index from an
embeddings table and publish it as catalog snapshots.

    zip -r deepex_spark.zip deepex_spark
    spark-submit --py-files deepex_spark.zip jobs/build_index.py \\
        --input /data/embeddings --output /warehouse/ann \\
        --k 256 --m 8 --dim 1024 --iters 4 --run-id idx1

Pipeline: distributed Lloyd's k-means trains the IVF coarse centroids
(operators/ann.py::kmeans_train), every vector gets its coarse bucket
(argmin assignment — row-local codegen), product quantization trains one
codebook per dim/m subspace and encodes vectors to m small ints in ONE
additional scan (pq_train_encode). Three tables publish through the
snapshot catalog (idempotent per run_id, previous index version stays
readable while the new one lands):

  ann_centroids  (cid, pos, val)            -- IVF coarse centroids
  ann_codebooks  (subspace, cid, pos, val)  -- PQ codebooks
  ann_codes      (vec_id, centroid_id, code0..code{m-1})

At query time: prune to probed centroid_id partitions (the table is
written partitioned by bucket of centroid_id), then ADC top-k over the
codes (pq_adc_topk) — the corpus never touches raw vectors again.
Everything is deterministic (seeded init, rounded means), so a rebuild
from the same input is byte-identical — the property that makes the
idempotent-run_id publish meaningful.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_index(spark, emb, catalog, k, m, dim, n_iter, seed, run_id):
    """Train + encode + publish; returns {table: (version, rows)}."""
    from pyspark.sql import functions as F

    from deepex_spark.operators.ann import kmeans_train, pq_train_encode

    assigned, centroids = kmeans_train(
        emb, k=k, dim=dim, n_iter=n_iter, seed=seed
    )
    # the PQ encode reuses kmeans_assign internally, which emits its own
    # `centroid_id` — carry the coarse bucket under a distinct name
    coarse = assigned.select(
        "vec_id", F.col("centroid_id").alias("ivf_cid"), "embedding"
    )
    enc, books = pq_train_encode(
        coarse, m=m, k=k, dim=dim, n_iter=n_iter, seed=seed + 1
    )
    code_cols = [f"code{j}" for j in range(m)]
    codes = enc.select(
        "vec_id", F.col("ivf_cid").alias("centroid_id"), *code_cols
    )

    cent_rows = [
        (cid, pos, val)
        for cid, row in enumerate(centroids)
        for pos, val in enumerate(row)
    ]
    book_rows = [
        (j, cid, pos, val)
        for j, book in enumerate(books)
        for cid, row in enumerate(book)
        for pos, val in enumerate(row)
    ]
    cent_df = spark.createDataFrame(cent_rows, "cid int, pos int, val double")
    book_df = spark.createDataFrame(
        book_rows, "subspace int, cid int, pos int, val double"
    )
    report = {}
    for table, df in (
        ("ann_centroids", cent_df),
        ("ann_codebooks", book_df),
        ("ann_codes", codes),
    ):
        v = catalog.write_snapshot(df, table, run_id=f"{run_id}-{table}")
        report[table] = (v, df.count())
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="embeddings parquet/table (vec_id, embedding)")
    p.add_argument("--output", required=True, help="catalog base dir")
    p.add_argument("--k", type=int, default=16, help="IVF centroids / PQ codebook size")
    p.add_argument("--m", type=int, default=2, help="PQ subspaces (dim must divide)")
    p.add_argument("--dim", type=int, required=True)
    p.add_argument("--iters", type=int, default=2, help="Lloyd rounds")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--run-id", default="idx0")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from deepex_spark.plans.catalog import Catalog
    from deepex_spark.session import build_session

    preexisting = SparkSession.getActiveSession() is not None
    spark = build_session(app_name=f"deepex-index-{args.run_id}")
    catalog = Catalog(args.output)
    emb = spark.read.parquet(args.input)
    t0 = time.time()
    report = build_index(
        spark, emb, catalog, args.k, args.m, args.dim, args.iters,
        args.seed, args.run_id,
    )
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "tables": {t: {"version": v, "rows": r} for t, (v, r) in report.items()},
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    if not preexisting:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
