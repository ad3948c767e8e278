"""spark-submit entry point: end-to-end training-corpus curation.

Composes the curation operators into the standard pre-training data
pipeline shape:

    scrub (PII redaction) -> quality gate (length, stopword ratio, and
    optional Gopher repetition rules — row-local, zero shuffle) ->
    exact dedup -> MinHash-LSH near-dup clustering (keep one canonical
    doc per cluster) -> optional corpus-global duplicate-substring gate
    (Lee et al. 2022 at token-window resolution — drops docs whose
    duplicated-span token share exceeds a threshold; catches the
    partial overlaps whole-doc Jaccard misses) -> optional eval-set
    decontamination (n-gram overlap, broadcast anti-join) ->
    deterministic stratified sampling -> partitioned parquet corpus

    zip -r deepex_spark.zip deepex_spark
    spark-submit --py-files deepex_spark.zip jobs/curate_corpus.py \\
        --input /data/documents --output /data/clean \\
        --rates-json rates.json --min-words 5 --buckets 512

Every stage is shuffle-minimal: redact and the quality gate are
row-local; exact dedup and MinHash are key-partitioned groupBys; the
near-dup candidate join is LSH-banded (never all-pairs); sampling is a
pushed-down filter. The one driver-side structure is the per-stage count
report (scalar aggregates). On N vs 4N executors the job is identical —
only --buckets (and the cluster) changes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def curate(
    docs,
    min_words: int = 3,
    max_stop_ratio: float = 1.0,
    rates: dict | None = None,
    default_rate: float = 1.0,
    no_redact: bool = False,
    minhash_sim: float = 0.5,
    near_dup_keep: str = "canonical",
    max_dup_frac: float = 1.0,
    max_top_share: float = 1.0,
    max_dupspan_ratio: float = 1.0,
    dupspan_window: int = 8,
    decontam_bench=None,
    decontam_ngram: int = 8,
):
    """documents(doc_id, text, lang, ...) -> (clean DataFrame, stage-count
    callables). Returned counts are lazy so the caller controls actions."""
    from pyspark.sql import functions as F

    from deepex_spark.operators.curate import (
        contamination_flags,
        redact,
        repetition_signals,
        stratified_sample,
    )
    from deepex_spark.operators.dedup import minhash_dup_pairs
    from deepex_spark.operators.graph import dedup_clusters

    input_cols = list(docs.columns)
    if not no_redact:
        docs = redact(docs).withColumn("text", F.col("scrubbed")).drop("scrubbed")

    words = F.split(F.col("text"), r"\s+")
    stop = F.array(*[F.lit(w) for w in ["the", "a", "an", "and", "or", "of", "to", "in", "is", "was"]])
    n_words = F.size(F.filter(words, lambda w: F.length(w) > 0))
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    quality_pred = (F.col("n_words") >= min_words) & (stop_ratio <= max_stop_ratio)
    if max_dup_frac < 1.0 or max_top_share < 1.0:
        # Gopher repetition rules, row-local (zero shuffle — the groupBy
        # variant repetition_stats is for reporting, not hot-path gating);
        # docs too short for a bigram have no signal and pass
        dup_frac, top_share = repetition_signals()
        quality_pred = (
            quality_pred
            & F.coalesce(dup_frac <= max_dup_frac, F.lit(True))
            & F.coalesce(top_share <= max_top_share, F.lit(True))
        )
    gated = docs.withColumn("n_words", n_words).where(quality_pred)

    # exact dedup: one survivor per byte-identical text (smallest doc_id)
    from pyspark.sql import Window

    w_exact = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = gated.withColumn("_rn", F.row_number().over(w_exact)).where(F.col("_rn") == 1).drop("_rn")

    # near-dup: LSH candidate pairs -> connected components -> one
    # survivor per cluster. Keep policy: "canonical" = smallest doc_id
    # (the dedup_clusters marker — cheapest, id-stable across re-runs);
    # "best" = longest member, ties to smallest id
    # (keep_best_per_cluster — the retain-the-most-complete-copy policy)
    if near_dup_keep not in ("canonical", "best"):
        raise ValueError("near_dup_keep must be 'canonical' or 'best'")
    pairs = minhash_dup_pairs(exact, "text", "doc_id", min_est_sim=minhash_sim)
    clusters = dedup_clusters(exact, pairs)
    if near_dup_keep == "best":
        from deepex_spark.operators.dedup import keep_best_per_cluster

        keepers = keep_best_per_cluster(
            exact, clusters.select("doc_id", "cluster_id")
        ).where(F.col("keep")).select("doc_id")
    else:
        keepers = clusters.where(F.col("is_canonical")).select("doc_id")
    near = exact.join(keepers, "doc_id", "inner")

    # corpus-global duplicate-SUBSTRING gate (Lee et al. 2022 at
    # window-token resolution, operators/curate.py::dup_spans): drops
    # docs whose duplicated-span token share exceeds the threshold —
    # the partial-overlap case whole-doc Jaccard clustering misses.
    # Runs AFTER near-dup so the window counts reflect the surviving
    # corpus (a removed near-dup's windows no longer inflate them)
    if max_dupspan_ratio < 1.0:
        from deepex_spark.operators.curate import dup_spans

        spanned = dup_spans(
            near, "doc_id", "text", window=dupspan_window
        ).where(F.col("dup_ratio") > max_dupspan_ratio).select("doc_id")
        near = near.join(F.broadcast(spanned), "doc_id", "left_anti")

    # eval-set decontamination AFTER dedup (smallest corpus pays the
    # n-gram sweep); contaminated ids are rare -> broadcast anti-join
    decontaminated = near
    if decontam_bench is not None:
        flagged = contamination_flags(
            near, n=decontam_ngram, bench=decontam_bench
        ).select("doc_id")
        decontaminated = near.join(F.broadcast(flagged), "doc_id", "left_anti")

    sampled = (
        stratified_sample(decontaminated, "doc_id", "lang", rates or {}, default_rate)
        if (rates or default_rate < 1.0)
        else decontaminated
    )
    # the written corpus carries ONLY the input schema: the audit columns
    # (quality's n_words, redact's n_<pattern> counts, sampling's h) are
    # intermediate — at 100 TB they are real storage/IO and a schema
    # surprise for downstream consumers
    sampled = sampled.select(*input_cols)
    return {
        "input": docs,
        "quality": gated,
        "exact": exact,
        "near": near,
        "decontaminated": decontaminated,
        "clean": sampled,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet (doc_id, text, lang, ...)")
    p.add_argument("--output", required=True, help="output dir for the clean corpus")
    p.add_argument("--min-words", type=int, default=3)
    p.add_argument("--max-stop-ratio", type=float, default=1.0)
    p.add_argument("--rates-json", default=None, help='JSON {lang: keep_rate}; e.g. {"en": 0.5}')
    p.add_argument("--default-rate", type=float, default=1.0)
    p.add_argument("--minhash-sim", type=float, default=0.5, help="near-dup est-Jaccard threshold")
    p.add_argument("--near-dup-keep", choices=("canonical", "best"), default="canonical",
                   help="near-dup survivor policy: canonical = smallest doc_id; "
                        "best = longest member (ties to smallest id)")
    p.add_argument("--max-dup-frac", type=float, default=1.0, help="Gopher duplicate-bigram-fraction gate (1.0 = off)")
    p.add_argument("--max-top-share", type=float, default=1.0, help="Gopher top-bigram-share gate (1.0 = off)")
    p.add_argument("--max-dupspan-ratio", type=float, default=1.0,
                   help="corpus-global duplicate-substring-span token-"
                        "share gate (Lee et al. substring dedup; 1.0 = off)")
    p.add_argument("--dupspan-window", type=int, default=8,
                   help="token window (= minimum detectable duplicated "
                        "substring length) for --max-dupspan-ratio")
    p.add_argument("--decontam-input", default=None, help="eval-set parquet with a text column: drop docs sharing an n-gram")
    p.add_argument("--decontam-ngram", type=int, default=8)
    p.add_argument("--no-redact", action="store_true")
    p.add_argument("--buckets", type=int, default=None, help="output files: repartition by hash(doc_id)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from deepex_spark.session import build_session

    preexisting = SparkSession.getActiveSession() is not None
    spark = build_session(app_name="deepex-curate")
    rates = json.loads(open(args.rates_json).read()) if args.rates_json else None

    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.decontam_input) if args.decontam_input else None
    t0 = time.time()
    stages = curate(
        docs,
        min_words=args.min_words,
        max_stop_ratio=args.max_stop_ratio,
        rates=rates,
        default_rate=args.default_rate,
        no_redact=args.no_redact,
        minhash_sim=args.minhash_sim,
        near_dup_keep=args.near_dup_keep,
        max_dup_frac=args.max_dup_frac,
        max_top_share=args.max_top_share,
        max_dupspan_ratio=args.max_dupspan_ratio,
        dupspan_window=args.dupspan_window,
        decontam_bench=bench,
        decontam_ngram=args.decontam_ngram,
    )
    # persist the expensive shared prefixes so the per-stage count report
    # doesn't re-run redact + quality + the dedup window per downstream
    # count — and persist `near` so the LSH clustering (the costliest
    # stage) runs once, not once more each for the near, decontaminated
    # and clean counts
    exact = stages["exact"].persist()
    stages["near"] = stages["near"].persist()
    clean = stages["clean"].persist()
    out = clean
    if args.buckets:
        out = clean.repartition(args.buckets, F.xxhash64("doc_id"))
    out.write.mode("overwrite").parquet(args.output)
    report = {name: df.count() for name, df in stages.items() if name != "clean"}
    report["clean"] = clean.count()
    report["wall_sec"] = round(time.time() - t0, 2)
    clean.unpersist()
    stages["near"].unpersist()
    exact.unpersist()
    print(json.dumps(report))
    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
