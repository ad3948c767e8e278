"""Round-6 auxiliary measurements (bench.py is FROZEN for the driver;
everything exploratory lives here — guide §1.4 noop-sink isolation).

Modes:
  --stages   per-stage noop isolation of pipeline_triples at $SPARK_GRAFT_SF_DIR
  --ivf      DataFrame-build / plan / execute split for ann_ivf_topk
  --ktruss   per-round peel profile (edge counts + wall) for kg_ktruss's graph
  --local N  single-process kernel wall over N sf0.1 docs (native vs python)

Each mode prints one JSON line. Used for the numbers quoted in
OPTIMIZATION_r06.md; none of this is on the driver's measurement path.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _session():
    from deepex_spark.session import build_session

    spark = build_session(
        app_name="deepex-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def run_stages() -> dict:
    from deepex_spark.config import DeepExConfig
    from deepex_spark.functions.sentencize import sentencize
    from deepex_spark.operators.distill import distill_project, with_doc_rank
    from deepex_spark.operators.extract import extract_candidates
    from deepex_spark.operators.rerank import rerank_triples
    from deepex_spark.pipeline import normalize_pages
    from deepex_spark.sources.pages import read_documents

    spark = _session()
    cfg = DeepExConfig.small()
    docs = read_documents(spark, SF_DIR).withColumnRenamed("docid", "url")
    out = {}
    spark.sparkContext.setJobDescription("stage: normalize")
    norm = normalize_pages(docs, cfg)
    out["normalize"] = _noop(norm)
    spark.sparkContext.setJobDescription("stage: +sentencize")
    sents = sentencize(norm, mode=cfg.sentencize_offsets, scan_max_len=cfg.sentencize_scan_max_len)
    out["sentencize"] = _noop(sents)
    spark.sparkContext.setJobDescription("stage: +extract (fused kernel)")
    cand = extract_candidates(sents, cfg)
    out["extract"] = _noop(cand)
    spark.sparkContext.setJobDescription("stage: +distill_project")
    proj = distill_project(cand, cfg)
    out["distill_project"] = _noop(proj)
    spark.sparkContext.setJobDescription("stage: +rerank window")
    out["rerank_window"] = _noop(rerank_triples(with_doc_rank(proj), cfg))
    spark.stop()
    return {"metric": "pipeline_stage_noop_sec", "value": out["rerank_window"],
            "unit": "sec", "queries": out, "sf_dir": SF_DIR, "cpus": int(CPUS)}


def run_ivf() -> dict:
    from pyspark.sql import functions as F

    from deepex_spark.operators.ann import ivf_search

    spark = _session()
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb.count()
    t0 = time.time()
    df = ivf_search(emb, F.col("vec_id") < 5, k_centroids=8, nprobe=3, topk=3, seed=733)
    t1 = time.time()
    df._jdf.queryExecution().executedPlan()
    t2 = time.time()
    n = df.count()
    t3 = time.time()
    again = ivf_search(emb, F.col("vec_id") < 5, k_centroids=8, nprobe=3, topk=3, seed=733).count()
    t4 = time.time()
    spark.stop()
    return {"metric": "ivf_split_sec", "value": round(t3 - t0, 3), "unit": "sec",
            "queries": {"build": round(t1 - t0, 3), "plan": round(t2 - t1, 3),
                        "execute": round(t3 - t2, 3), "repeat": round(t4 - t3, 3)},
            "rows": n, "rows_repeat": again}


def run_ktruss_profile(k: int = 8, n_rounds: int = 3) -> dict:
    from pyspark.sql import functions as F

    import deepex_spark.operators.graph as G
    import deepex_spark.queries as Q

    spark = _session()
    live = G._undirected(
        Q._part_cooccurrence_edges(spark, SF_DIR), "src", "dst"
    ).localCheckpoint(eager=True)
    thr = max(k - 2, 1)
    rounds = []
    n0 = live.count()
    # replicate the recount-per-round reference shape to expose the
    # removal profile that motivates the hybrid in operators/graph.py
    for r in range(n_rounds):
        t0 = time.time()
        keep = (
            live.join(_support_of(G, live), ["a", "b"], "left")
            .select("a", "b", F.coalesce("support", F.lit(0)).alias("support"))
            .where(F.col("support") >= thr)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n1 = keep.count()
        rounds.append({"round": r, "live": n0, "kept": n1,
                       "removed": n0 - n1, "sec": round(time.time() - t0, 1)})
        live, n0 = keep, n1
    spark.stop()
    return {"metric": "ktruss_round_profile", "value": rounds[-1]["kept"],
            "unit": "edges", "rounds": rounds}


def _support_of(G, live):
    # the explode-based support pass, as used inside operators/graph.ktruss
    from pyspark.sql import functions as F

    deg = (
        live.select(F.col("a").alias("x"))
        .union(live.select(F.col("b").alias("x")))
        .groupBy("x").agg(F.count("*").alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    a_first = (F.col("da.deg") < F.col("db.deg")) | (
        (F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b"))
    )
    o = (
        live.join(da, live["a"] == F.col("da.x"))
        .join(db, live["b"] == F.col("db.x"))
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(a_first, F.col("db.deg")).otherwise(F.col("da.deg")).alias("dhi"),
        )
    )
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.hint("shuffle_hash").alias("o3")
    hi_lt = (F.col("o1.dhi") < F.col("o2.dhi")) | (
        (F.col("o1.dhi") == F.col("o2.dhi")) & (F.col("o1.hi") < F.col("o2.hi"))
    )
    tri = (
        o1.join(o2, (F.col("o1.lo") == F.col("o2.lo")) & hi_lt)
        .join(o3, (F.col("o3.lo") == F.col("o1.hi")) & (F.col("o3.hi") == F.col("o2.hi")))
        .select(F.col("o1.lo").alias("v1"), F.col("o1.hi").alias("v2"), F.col("o2.hi").alias("v3"))
    )
    corners = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("v1").alias("u"), F.col("v2").alias("v")),
                F.struct(F.col("v1").alias("u"), F.col("v3").alias("v")),
                F.struct(F.col("v2").alias("u"), F.col("v3").alias("v")),
            )
        ).alias("e")
    )
    return (
        corners.select(F.least("e.u", "e.v").alias("a"), F.greatest("e.u", "e.v").alias("b"))
        .groupBy("a", "b").agg(F.count("*").alias("support"))
    )


def run_local(n_docs: int = 300) -> dict:
    import pandas as pd

    from deepex_spark.config import DeepExConfig
    from deepex_spark.local_oracle import local_candidates

    df = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    pages = list(zip(df["doc_id"].astype(str), df["text"]))[:n_docs]
    cfg = DeepExConfig.small()
    t0 = time.time()
    rows = local_candidates(pages, cfg)
    native = round(time.time() - t0, 2)
    return {"metric": "local_kernel_sec", "value": native, "unit": "sec",
            "n_docs": n_docs, "n_candidates": len(rows),
            "native_kernel": True}


if __name__ == "__main__":
    if "--stages" in sys.argv:
        print(json.dumps(run_stages()))
    elif "--ivf" in sys.argv:
        print(json.dumps(run_ivf()))
    elif "--ktruss" in sys.argv:
        print(json.dumps(run_ktruss_profile()))
    elif "--local" in sys.argv:
        i = sys.argv.index("--local")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 300
        print(json.dumps(run_local(n)))
    else:
        print(json.dumps(run_stages()))
