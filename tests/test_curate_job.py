"""End-to-end corpus-curation job (jobs/curate_corpus.py)."""

import json

from pyspark.sql import functions as F

from jobs.curate_corpus import curate, main


def test_stage_semantics(spark):
    rows = [
        # exact dups: 1 and 2 byte-identical -> keep 1
        (1, "alpha beta gamma delta shared words here", "en"),
        (2, "alpha beta gamma delta shared words here", "en"),
        # near-dup of 1 (one word changed) -> same cluster, dropped
        (3, "alpha beta gamma delta shared words there", "en"),
        # distinct doc, survives
        (4, "completely different content with many unique tokens inside", "de"),
        # too short -> quality-gated
        (5, "tiny", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    stages = curate(docs, min_words=3, no_redact=True, minhash_sim=0.3)
    assert stages["quality"].count() == 4
    kept_exact = {r["doc_id"] for r in stages["exact"].select("doc_id").collect()}
    assert kept_exact == {1, 3, 4}
    kept_near = {r["doc_id"] for r in stages["near"].select("doc_id").collect()}
    assert kept_near == {1, 4}
    assert {r["doc_id"] for r in stages["clean"].select("doc_id").collect()} == {1, 4}


def test_redact_applied_to_text(spark):
    docs = spark.createDataFrame(
        [(1, "reach me at someone@example.com for more details today", "en")],
        "doc_id long, text string, lang string",
    )
    stages = curate(docs, min_words=1)
    [r] = stages["clean"].select("text").collect()
    assert "[REDACTED]" in r["text"] and "@" not in r["text"]


def test_string_doc_ids_survive(spark):
    """UUID-style string doc_ids: the near-dup clustering must not cast
    them to NULL longs and silently empty the corpus."""
    rows = [
        ("doc-aaa", "alpha beta gamma delta shared words here", "en"),
        ("doc-bbb", "alpha beta gamma delta shared words there", "en"),
        ("doc-ccc", "completely different content with many unique tokens inside", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    stages = curate(docs, min_words=3, no_redact=True, minhash_sim=0.3)
    kept = {r["doc_id"] for r in stages["clean"].select("doc_id").collect()}
    assert kept == {"doc-aaa", "doc-ccc"}


def test_job_cli(spark, tmp_path):
    src, out = str(tmp_path / "docs"), str(tmp_path / "clean")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    rates = tmp_path / "rates.json"
    rates.write_text(json.dumps({"en": 0.5}))
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            [
                "--input", src,
                "--output", out,
                "--rates-json", str(rates),
                "--min-words", "3",
                "--buckets", "4",
            ]
        )
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    # monotone pipeline: each stage keeps a subset of the previous
    assert (
        report["input"]
        >= report["quality"]
        >= report["exact"]
        >= report["near"]
        >= report["clean"]
        > 0
    )
    written = spark.read.parquet(out)
    assert written.count() == report["clean"]
    # the clean corpus carries ONLY the input schema — no audit columns
    # (n_words, n_email/n_ipv4/n_url, sampling hash h) leak into storage
    assert sorted(written.columns) == sorted(spark.read.parquet(src).columns)
    # the en 0.5 sampling rule really applied: every surviving en doc's
    # md5 prefix is under the threshold (hashlib.md5 == Spark md5 on the
    # same string), and the corpus contains en docs on the other side of
    # the threshold, so the filter is non-vacuous
    import hashlib

    def h4(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[:4]

    en_kept = [r["doc_id"] for r in written.where(F.col("lang") == "en").collect()]
    assert en_kept and all(h4(d) < "8000" for d in en_kept)
    all_en = [
        r["doc_id"]
        for r in spark.read.parquet(src).where(F.col("lang") == "en").collect()
    ]
    assert any(h4(d) >= "8000" for d in all_en)


def test_repetition_gate(spark):
    loop_spam = " ".join(["buy", "now"] * 20)
    rows = [
        (1, loop_spam, "en"),
        (2, "a genuinely varied sentence with no repeated bigrams at all", "en"),
        (3, "hello world hello world hello world hello world", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    stages = curate(docs, min_words=1, no_redact=True, max_dup_frac=0.5)
    assert {r["doc_id"] for r in stages["quality"].collect()} == {2}
    # gate off by default: all pass
    stages = curate(docs, min_words=1, no_redact=True)
    assert stages["quality"].count() == 3


def test_top_share_gate_catches_what_dup_frac_misses(spark):
    # doc 1: every bigram distinct (dup_frac = 0) but one token dominates
    # alternations -> 'x q','q x' style repeats... construct: 'x a x b x c'
    # bigrams: xa ax xb bx xc -> all distinct, dup_frac 0, top_share 0.2.
    # doc 2: 'hello world' -> ONE bigram -> top_share 1.0, dup_frac 0.0:
    # only the top_share gate can catch it
    rows = [
        (1, "x a x b x c", "en"),
        (2, "hello world", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    stages = curate(docs, min_words=1, no_redact=True, max_top_share=0.9)
    assert {r["doc_id"] for r in stages["quality"].collect()} == {1}
    # dup_frac alone would pass both
    stages = curate(docs, min_words=1, no_redact=True, max_dup_frac=0.5)
    assert stages["quality"].count() == 2


def test_decontamination_anti_join(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight", "en"),
        (2, "totally unrelated text with nothing shared at all okay", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    bench = spark.createDataFrame(
        [("eval question about the quick brown fox jumps over things",)],
        "text string",
    )
    stages = curate(
        docs, min_words=1, no_redact=True, decontam_bench=bench, decontam_ngram=5
    )
    assert {r["doc_id"] for r in stages["decontaminated"].collect()} == {2}
    assert {r["doc_id"] for r in stages["clean"].collect()} == {2}
    # without a bench set the stage is a no-op
    stages = curate(docs, min_words=1, no_redact=True)
    assert stages["decontaminated"].count() == 2


def test_dupspan_gate(spark):
    """--max-dupspan-ratio drops the doc that is mostly a substring
    copy of ANOTHER doc — the partial overlap whole-doc Jaccard misses
    at the configured threshold — and leaves the source doc (low ratio)
    and unrelated docs alone. Off by default."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # an 8-token duplicated block
    rows = [
        # long source doc: the shared block is a small share of it
        (1, shared + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14"
            " x15 x16 x17 x18 x19 x20 x21 x22 x23 x24", "en"),
        # mostly the shared block -> high dup ratio, gated
        (2, shared + " y1", "en"),
        # unrelated
        (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    stages = curate(
        docs, min_words=1, no_redact=True,
        max_dupspan_ratio=0.5, dupspan_window=8,
    )
    assert {r["doc_id"] for r in stages["near"].collect()} == {1, 3}
    # gate off: all three survive to the near stage
    stages = curate(docs, min_words=1, no_redact=True)
    assert stages["near"].count() == 3


def test_keep_best_policy_prefers_longest(spark, tmp_path):
    """--near-dup-keep best retains the longest near-dup; the default
    canonical policy retains the smallest id. Same cluster, different
    survivor."""
    from jobs.curate_corpus import curate

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base, "en"),                                  # shorter copy, smaller id
            (2, base + " iota kappa " + base, "en"),          # longer near-dup
            (3, "completely different unrelated text here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    best = curate(docs, min_words=1, no_redact=True, minhash_sim=0.3,
                  near_dup_keep="best")["clean"]
    canon = curate(docs, min_words=1, no_redact=True, minhash_sim=0.3,
                   near_dup_keep="canonical")["clean"]
    best_ids = {r["doc_id"] for r in best.collect()}
    canon_ids = {r["doc_id"] for r in canon.collect()}
    # 1 and 2 cluster at this sim (verified): canonical keeps the id-min
    # copy, best keeps the longer one; doc 3 always survives
    assert canon_ids == {1, 3}
    assert best_ids == {2, 3}


def test_keep_policy_guard(spark):
    import pytest as _pytest

    from jobs.curate_corpus import curate

    docs = spark.createDataFrame([(1, "a b c", "en")], "doc_id long, text string, lang string")
    with _pytest.raises(ValueError, match="near_dup_keep"):
        curate(docs, near_dup_keep="newest")
