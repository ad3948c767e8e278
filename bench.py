"""Benchmark driver.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ..., ...}

--scaling mode: runs the identical end-to-end pipeline job on the identical
input at local[8] and local[32] (the sandbox substitute for N vs 4N
executors, BASELINE.md protocol), reports throughput at both plus the
scaling efficiency eff = (rate_32 / rate_8) / 4, and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "pipeline_triples",
    "o3_sentences",
    "o19_dedup_agg",
    "o27_alias_broadcast_join",
    "o30_pr_curve",
    "ann_cosine_topk",
    "dedup_exact",
]


def _sf_label(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        return -1.0


def run_headline() -> dict:
    from deepex_spark.queries import REGISTRY
    from deepex_spark.session import build_session

    spark = build_session(
        app_name="deepex-bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    # warm the JVM + python workers once so per-query times measure the work
    spark.range(1000).selectExpr("sum(id)").collect()

    per_query: dict[str, float] = {}
    n_triples = 0
    triples_sec = 0.0
    for name in HEADLINE:
        spec = REGISTRY[name]
        t0 = time.time()
        n = spec.spark_fn(spark, SF_DIR).count()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        if name == "pipeline_triples":
            n_triples = n
            triples_sec = dt
    spark.stop()
    total = round(sum(per_query.values()), 3)
    return {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_label(SF_DIR),
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / triples_sec, 1) if triples_sec else 0.0,
        "cpus": int(CPUS),
    }


def _run_pipeline_once(master_threads: int, sf_dir: str) -> tuple[int, float]:
    from deepex_spark.queries import REGISTRY
    from deepex_spark.session import build_session

    spark = build_session(
        app_name=f"deepex-scale-{master_threads}",
        master=f"local[{master_threads}]",
        shuffle_partitions=max(master_threads, 8),
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.time()
    n = REGISTRY["pipeline_triples"].spark_fn(spark, sf_dir).count()
    dt = time.time() - t0
    spark.stop()
    return n, dt


def run_scaling() -> dict:
    results = {}
    for threads in (8, 32):
        n, dt = _run_pipeline_once(threads, SF_DIR)
        results[threads] = {"n_triples": n, "sec": round(dt, 2), "rate": round(n / dt, 1)}
    eff = (results[32]["rate"] / results[8]["rate"]) / (32 / 8)
    out = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {f"local[{k}]": v["sec"] for k, v in results.items()},
        "sf": _sf_label(SF_DIR),
        "detail": results,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — measured throughput & scaling\n\n"
            "Protocol (BASELINE.md): identical end-to-end triple-extraction "
            "job (documents -> normalize -> sentencize -> fused beam-search "
            "kernel -> distill -> contrastive rerank) on identical input at "
            "two parallelism levels — the sandbox substitute for N vs 4N "
            "executors.\n\n"
            f"Input: `{SF_DIR}/documents.parquet`\n\n"
            "| parallelism | triples | wall sec | triples/sec |\n|---|---|---|---|\n"
            + "".join(
                f"| local[{k}] | {v['n_triples']} | {v['sec']} | {v['rate']} |\n"
                for k, v in results.items()
            )
            + f"\nScaling efficiency (rate32/rate8)/4 = **{eff:.3f}** "
            f"(target >= 0.8)\n"
        )
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_headline()))
