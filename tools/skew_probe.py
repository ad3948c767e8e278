"""Skew-path evidence for the post-kernel docid exchange (EXPLAIN.md §6).

Synthesizes a corpus with ONE hot document of ~10^4 sentences alongside
normal 2-6-sentence docs, runs the full pipeline, and reports:

* wall time of the skewed corpus vs a balanced corpus with the SAME total
  sentence count — both measured WARM (a throwaway warm-up job runs
  first; cold-JVM ordering otherwise inflates whichever runs first ~2x);
* the window-stage input imbalance: per-partition row counts of the
  docid-hash exchange BEFORE any top-k filter (``distill_triples`` output
  carries every ranked row), where the hot doc's rows land in ONE
  partition by construction.

Why this decomposition: the expensive stage (the beam-search kernel) is
partitioned round-robin over SENTENCES before any docid grouping
(extract.py), so a hot document spreads across every core and cannot
skew the kernel. The two per-DOC serial costs are (a) the sentencize
first-occurrence ``instr`` scan — O(unique sentences x doc length),
faithful to the reference's ``full_text.find`` quirk, measured here in
BOTH modes: forced ``scan`` (the pathological term) and the default
``auto`` (which routes this hot doc to the linear reconstruct branch) —
and (b) the single-partition window sort over the hot doc's triples.
AQE's skew splitting does NOT apply to window partitions (partitionBy
requires co-location), so if these numbers ever grew pathological the
fix is a per-doc sentence cap or a two-phase rank, not AQE.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_NORMAL = 5000
HOT_SENTS = 10_000


def main() -> None:
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from deepex_spark.config import DeepExConfig
    from deepex_spark.operators.distill import distill_triples
    from deepex_spark.operators.extract import extract_candidates
    from deepex_spark.functions.sentencize import sentencize
    from deepex_spark.pipeline import extract_triples, normalize_pages
    from deepex_spark.session import build_session
    from deepex_spark.sources.pages import PAGES_SCHEMA, synth_doc, synth_pages

    spark = build_session("skew-probe")
    cfg = DeepExConfig.small()

    rng = random.Random(99)
    hot_text = synth_doc(rng, HOT_SENTS)
    hot = spark.createDataFrame(
        [("https://example.org/hot/0", dt.datetime(2024, 1, 1),
          b"<html></html>", hot_text, "en")],
        PAGES_SCHEMA,
    )
    skewed = synth_pages(spark, n_docs=N_NORMAL, seed=5).unionByName(hot)
    # balanced control, same total sentence volume (normal docs average
    # ~4.6 sentences incl. noise/dups)
    extra = int(HOT_SENTS / 4.6)
    balanced = synth_pages(spark, n_docs=N_NORMAL + extra, seed=5)

    # warm-up: JVM codegen + python worker pool, excluded from timings
    extract_triples(synth_pages(spark, n_docs=200, seed=1), cfg).count()

    import bench as _bench

    def timed(pages):
        s0 = _bench._read_steal()
        t0 = time.time()
        n = extract_triples(pages, cfg).count()
        dt = round(time.time() - t0, 2)
        return n, dt, _bench._steal_pct(s0, _bench._read_steal())

    hw = _bench.hw_canary()
    n_bal, t_bal, st_bal = timed(balanced)
    n_skew, t_skew, st_skew = timed(skewed)
    # second interleaved measurement to expose run-to-run noise
    n_bal2, t_bal2, st_bal2 = timed(balanced)
    n_skew2, t_skew2, st_skew2 = timed(skewed)

    # sentencize-only serial cost of the hot doc (one row -> one task).
    # .count() would prune the computed sent_offset column and the instr
    # scan with it — force materialization through an aggregate over the
    # offset itself, so the timed query pays the exact per-sentence cost.
    def timed_sentencize(mode):
        t0 = time.time()
        row = (
            sentencize(normalize_pages(hot, cfg), mode=mode)
            .agg(F.sum("sent_offset").alias("s"), F.count("*").alias("n"))
            .collect()[0]
        )
        return row["n"], round(time.time() - t0, 2)

    n_hot_sents, t_sentencize_scan = timed_sentencize("scan")
    _, t_sentencize_default = timed_sentencize(cfg.sentencize_offsets)

    # window-stage input imbalance, pre-filter
    tri = distill_triples(extract_candidates(sentencize(
        normalize_pages(skewed, cfg)), cfg), cfg)
    stats = sorted(
        r["count"]
        for r in tri.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    out = {
        "hot_doc": {"chars": len(hot_text), "sentences": n_hot_sents,
                    "sentencize_scan_serial_s": t_sentencize_scan,
                    "sentencize_default_mode": cfg.sentencize_offsets,
                    "sentencize_default_s": t_sentencize_default},
        "hw_mops": hw,
        "balanced": {"docs": N_NORMAL + extra, "triples": n_bal,
                     "wall_s": [t_bal, t_bal2],
                     "steal_pct": [st_bal, st_bal2]},
        "skewed": {"docs": N_NORMAL + 1, "triples": n_skew,
                   "wall_s": [t_skew, t_skew2],
                   "steal_pct": [st_skew, st_skew2]},
        "slowdown_warm": round(min(t_skew, t_skew2) / min(t_bal, t_bal2), 3),
        "window_partitions": {"n": len(stats),
                              "median_rows": stats[len(stats) // 2],
                              "max_rows": stats[-1],
                              "max_over_median": round(stats[-1] / stats[len(stats) // 2], 1)},
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
