"""Training-data curation / event-log analytics operators.

Three ops a 100 TB pipeline needs around the extraction core:

* ``sessionize`` — gap-based sessionization of an event log (the classic
  lag + conditional-cumsum window pattern), used to segment user/crawler
  activity before per-session aggregation.
* ``stratified_sample`` — deterministic per-stratum downsampling via an
  md5 hash-prefix threshold: reproducible across engines, runs and
  partitionings (no RNG state), the standard way to rebalance
  over-represented languages/sources in a training corpus.
* ``ngram_counts`` — corpus-level n-gram heavy hitters (vocab / LM
  statistics): explode token n-grams, map-side-combined count, total-order
  top-k.

All three are pure column algebra (no UDFs, whole-stage codegen'd) and
every computed column is deterministic, so each registers with an exact
DuckDB oracle (queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 30 * 60,
) -> DataFrame:
    """Gap-based sessionization -> one row per (user, session) with
    ``(n_events, sess_start, sess_end, total_value)``.

    A new session starts when the micro-exact gap to the previous event
    of the same user EXCEEDS ``gap_seconds`` (a gap of exactly
    ``gap_seconds`` stays in the session). Session ids are the running
    count of session starts per user (1-based), so they are dense and
    deterministic; ordering ties on ``ts`` break by ``order_col``.

    Scale: one window partitioned by user (the natural key — a user's
    history fits a partition; AQE splits pathological bot keys), then a
    groupBy on the same key with map-side partial aggregation. The gap
    compare is timestamp SUBTRACTION against a day-time interval —
    microsecond-exact and timezone-free (works on TIMESTAMP_NTZ without
    ever interpreting a wall time in the session zone, so the result
    cannot depend on ``spark.sql.session.timeZone``).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    ts = F.col(ts_col)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
    new_sess = F.when(ts - F.lag(ts).over(w) <= gap, F.lit(0)).otherwise(F.lit(1))
    tagged = events.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return tagged.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("sess_start"),
        F.max(ts_col).alias("sess_end"),
        F.round(F.sum(value_col), 4).alias("total_value"),
    )


def _rate_to_hex4(rate: float) -> str:
    """Map a keep-rate in [0, 1] to a 4-hex-digit md5-prefix threshold.

    ``substr(md5(key), 1, 4) < threshold`` keeps ~rate of keys: the 4-char
    lowercase-hex prefix is uniform over '0000'..'ffff' and string-compares
    identically in every engine. rate >= 1 maps past 'ffff' so everything
    passes; granularity is 1/65536.
    """
    if rate >= 1.0:
        return "g"
    v = int(round(rate * 0x10000))
    if v >= 0x10000:
        # rates within half a bucket of 1.0 round UP to the whole range:
        # format(65536, '04x') would be the 5-char '10000', which compares
        # LESS than most 4-char prefixes and silently kept only ~6 % of
        # rows — return the keep-everything sentinel instead
        return "g"
    return format(max(v, 0), "04x")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep each row iff the 4-hex
    md5 prefix of its key falls under its stratum's threshold.

    Unlike ``df.sample()`` (seeded per-partition RNG — resultset changes
    with partitioning), the decision is a pure function of the row key, so
    the sample is stable across runs, partitionings and engines, and an
    incremental re-run keeps exactly the same rows. Adds ``h`` (the hash
    prefix) for auditability. Filter only — pushed down to the scan.

    NULL keys hash as the empty string (md5(NULL) is NULL and a NULL
    ``h < thr`` predicate would silently DROP those rows even at
    keep-rate 1.0); they therefore share one deterministic bucket and
    follow their stratum's rate like any other key.
    """
    if "h" in df.columns:
        raise ValueError(
            "stratified_sample writes its audit hash to column 'h', which "
            "already exists on the input — rename or drop it first"
        )
    h = F.substring(
        F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit(""))), 1, 4
    )
    thr = F.lit(_rate_to_hex4(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(_rate_to_hex4(rate))).otherwise(thr)
    return df.withColumn("h", h).where(F.col("h") < thr)


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-ordered funnel on first occurrences -> one row of per-stage
    user counts (``n_users, n_stage1, n_stage1_2, ...``).

    A user converts through stage k iff their FIRST stage-k event is at
    or after their first stage-(k-1) event, recursively — the standard
    product-analytics funnel on an unordered event log. One groupBy
    per user with conditional-min aggregates (map-side combined), then a
    single global count row: no self-joins, no per-stage passes over the
    log, and nothing driver-side — the shape survives any log size.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    firsts = events.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"t{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached = F.col("t0").isNotNull()
    aggs = [
        F.count("*").alias("n_users"),
        F.sum(reached.cast("long")).alias("n_stage1"),
    ]
    for i in range(1, len(stages)):
        reached = reached & F.col(f"t{i}").isNotNull() & (
            F.col(f"t{i}") >= F.col(f"t{i-1}")
        )
        aggs.append(F.sum(reached.cast("long")).alias(f"n_stage1_{i + 1}"))
    return firsts.agg(*aggs)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix -> ``(cohort_week, age_weeks,
    n_active)``: users bucketed by the ISO week of their FIRST event,
    counted distinct in every later week they act — the classic
    product-analytics retention triangle, and for a crawl/event log the
    standard "does a source keep producing" decay view.

    Two shuffles, both on ``user_col``: the first-event groupBy
    (map-side combined) and the join of events back to their user's
    cohort — co-partitioned, so AQE plans the second exchange only for
    the smaller firsts side. The final (cohort, age) aggregate runs on
    the already-user-partitioned stream; distinct-user counts per cell
    are exact (cells are bounded by cohort size — swap in
    approx_count_distinct at 10^9-user scale).
    """
    firsts = events.groupBy(user_col).agg(F.min(ts_col).alias("first_ts"))
    cohort = F.date_trunc("week", F.col("first_ts"))
    week = F.date_trunc("week", F.col(ts_col))
    return (
        events.join(firsts, user_col)
        .select(
            F.col(user_col),
            cohort.alias("cohort_week"),
            F.floor(F.datediff(week, cohort) / 7).cast("bigint").alias("age_weeks"),
        )
        .groupBy("cohort_week", "age_weeks")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )


def tfidf_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
    broadcast_df: bool = True,
) -> DataFrame:
    """Per-document top-k TF-IDF terms -> ``(doc_id, term, tf, df, tfidf,
    rk)`` with ``tfidf = tf * ln(N / df)`` rounded to 6 decimals BEFORE
    ranking, so the (tfidf DESC, term ASC) order — and therefore the
    top-k row set — is identical across engines even when their ln()
    differs in the last ulp.

    Scale: tf is a (doc, term) groupBy with map-side combine; df derives
    from tf (one row per distinct (doc, term), so counting rows per term
    IS the document frequency); the final window partitions by doc
    (bounded by doc length, and compiled to WindowGroupLimit so at most
    k rows per doc cross the shuffle). N is the one driver-side scalar
    (a count, not rows). ``broadcast_df=True`` ships the
    vocabulary-sized df side to every executor — right for word vocabs
    (≤ a few M terms); pass False for open vocabularies (raw n-grams,
    URLs) where the term table outgrows executor memory and the join
    should shuffle on ``term`` instead.
    """
    terms = docs.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term")
    ).where(F.length("term") > 0)
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(id_col).distinct().count()
    df_side = F.broadcast(df) if broadcast_df else df
    scored = tf.join(df_side, "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select(id_col, "term", "tf", "df", "tfidf", "rk")
    )


# ASCII-only patterns in the common Java-regex / RE2 subset, so Spark
# (java.util.regex) and DuckDB (RE2) match the same spans: no backrefs,
# no lookarounds, \b as the ASCII word boundary.
REDACTION_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def redact(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token: str = "[REDACTED]",
) -> DataFrame:
    """Policy scrubbing for a training corpus: replace every match of
    each named pattern with ``token`` and count what was removed.

    Adds ``scrubbed`` (the redacted text) and one ``n_<name>`` count per
    pattern (counted on the ORIGINAL text, so chained replacements can't
    hide earlier matches from later counts). Patterns apply in sorted
    name order for determinism. Pure ``regexp_replace``/``regexp_count``
    column algebra — JVM-side, codegen'd, no UDF — and row-local, so it
    scales embarrassingly (no shuffle at all).
    """
    pats = patterns if patterns is not None else REDACTION_PATTERNS
    # regexp_replace's replacement slot interprets $N and \ as group
    # references (java.util.regex.Matcher) — quote them so a literal
    # token like '<$1>' can't throw or substitute match groups
    quoted = token.replace("\\", "\\\\").replace("$", "\\$")
    scrubbed = F.col(text_col)
    out = df
    for name in sorted(pats):
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pats[name])))
        scrubbed = F.regexp_replace(scrubbed, pats[name], quoted)
    return out.withColumn("scrubbed", scrubbed)


def token_ngrams(toks, n: int):
    """Array column of space-joined token ``n``-grams, built JVM-side by
    zipping ``n`` shifted slices of the token array (no Python, no
    quadratic substring scan). Grams touching an empty token come out
    NULL so callers can drop them with one isNotNull filter (including
    at n=1, where empty tokens are nulled rather than passed through).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    width = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.slice(toks, 1, width)
    if n == 1:
        return F.transform(grams, lambda x: F.when(F.length(x) > 0, x))
    for i in range(1, n):
        nxt = F.slice(toks, i + 1, width)
        grams = F.zip_with(
            grams,
            nxt,
            lambda a, b: F.when(
                (F.length(a) > 0) & (F.length(b) > 0), F.concat(a, F.lit(" "), b)
            ),
        )
    return grams


def ngram_counts(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top_k: int = 500,
) -> DataFrame:
    """Corpus-level token n-gram heavy hitters -> top-k ``(ngram, n)``
    rows under the total order (count DESC, ngram ASC) — deterministic
    even when the k-th count ties.

    Tokens are lowercase whitespace-split (ASCII ``\\s+``); n-grams come
    from :func:`token_ngrams`. The count is a groupBy with
    map-side partial aggregation — the shuffle carries one partial row
    per distinct n-gram per partition, not one per occurrence — and the
    top-k is Spark's TakeOrdered (per-partition heaps + driver merge of
    k-row heads), never a global sort of the full tail.
    """
    grams = token_ngrams(F.split(F.lower(F.col(text_col)), r"\s+"), n)
    exploded = docs.select(F.explode(grams).alias("ngram")).where(
        F.col("ngram").isNotNull() & (F.length("ngram") > 0)
    )
    return (
        exploded.groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("ngram"))
        .limit(top_k)
    )


def _tokens(text_col: str, token_split: str, lowercase: bool):
    """Token array under the curation layer's two tokenization regimes:
    the robust default (``\\s+`` split of lowercased text — what a real
    eval-leakage/quality sweep wants, matching ngram_counts/tfidf) and
    the byte-literal single-space split the registered oracle queries
    pin (DuckDB ``string_split(text, ' ')``)."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return F.split(col, token_split)


def contamination_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    bench_mod: int = 97,
    bench: DataFrame | None = None,
    token_split: str = r"\s+",
    lowercase: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any token
    ``n``-gram with a held-out benchmark set -> ``(doc_id, n_hits)``
    where ``n_hits`` is the number of DISTINCT contaminated n-grams in
    the doc (only contaminated docs are emitted).

    This is the standard eval-leakage sweep (GPT-3 appendix C / Gopher
    sec. A.3 style: drop training docs overlapping an eval set on a
    13-gram; ``n`` is a knob because synthetic corpora have shorter
    spans). Pass ``bench`` (any frame with ``text_col``) to sweep
    against a real eval set — then ALL of ``docs`` is corpus; without
    it, the deterministic ``doc_id % bench_mod == 0`` subset stands in
    for the eval-set ids.

    Scale: the benchmark side is tiny by construction (an eval set, not
    a corpus), so its distinct-gram set is BROADCAST and the corpus side
    joins map-side with NO shuffle at all before the contamination
    filter — the join is applied to the raw exploded grams (duplicates
    and all) precisely so the corpus never pays a corpus-wide
    (doc, gram) distinct exchange; the only corpus shuffle carries the
    join SURVIVORS (contaminated grams — rare by design), where the
    per-doc distinct-count collapses repeats.
    """
    toks = _tokens(text_col, token_split, lowercase)
    grams = F.explode(token_ngrams(toks, n)).alias("g")
    if bench is not None:
        bench_side, corpus_side = bench, docs
    else:
        is_bench = (F.col(id_col) % bench_mod) == 0
        bench_side, corpus_side = docs.where(is_bench), docs.where(~is_bench)
    bench_grams = (
        bench_side.select(
            F.explode(
                token_ngrams(_tokens(text_col, token_split, lowercase), n)
            ).alias("g")
        )
        .where(F.col("g").isNotNull() & (F.length("g") > 0))
        .distinct()
    )
    corpus_grams = corpus_side.select(F.col(id_col), grams).where(
        F.col("g").isNotNull()
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("g")).alias("n_hits"))
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    token_split: str = r"\s+",
    lowercase: bool = True,
) -> DataFrame:
    """Gopher-style within-document repetition signals ->
    ``(doc_id, n_grams, n_distinct, dup_frac, top_share)``.

    * ``dup_frac`` — fraction of token n-gram OCCURRENCES that are
      repeats of an earlier occurrence (``1 - distinct/total``); Gopher
      filters docs where this exceeds ~0.2 for 2-grams.
    * ``top_share`` — share of occurrences taken by the single most
      frequent n-gram (the "duplicate top-2-gram fraction" rule).

    Docs with fewer than ``n`` tokens have no n-grams and are not
    emitted. Two groupBys, both map-side combined: (doc, gram) counts
    first (the only shuffle that scales with text volume, carrying one
    row per distinct per-doc gram), then a per-doc rollup of three
    scalars. Ratios are rounded to 4 so engine summation order cannot
    flip the value hash.
    """
    toks = _tokens(text_col, token_split, lowercase)
    exploded = docs.select(
        F.col(id_col), F.explode(token_ngrams(toks, n)).alias("g")
    ).where(F.col("g").isNotNull() & (F.length("g") > 0))
    cnt = exploded.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    per_doc = cnt.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_distinct",
        F.round(
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_grams"), 4
        ).alias("dup_frac"),
        F.round(F.col("top_c").cast("double") / F.col("n_grams"), 4).alias("top_share"),
    )


def rare_bigram_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max_count: int = 2,
    token_split: str = r"\s+",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-conditioned rare-bigram fraction per doc ->
    ``(doc_id, n_bigrams, n_rare, rare_frac)`` — the CCNet/KenLM-style
    fluency proxy with integer-exact cross-engine semantics: a bigram is
    "rare" when its whole-corpus occurrence count is <= ``rare_max_count``,
    and gibberish / OOD / mojibake docs surface as a high share of
    occurrences spent on corpus-rare bigrams. (A real LM-perplexity
    filter needs a float log-prob sum whose engine-dependent summation
    order breaks value-hash oracles; this keeps every aggregate integral
    and spends exactly ONE float op — the final ratio — before round().)

    Plan: per-(doc, gram) counts first (map-side combined — the only
    shuffle that scales with text volume), then the corpus model is a
    REUSE of that aggregate (gram-keyed rollup of the same rows, not a
    second source scan), then one gram-keyed join back and a per-doc
    rollup. At 100 TB the model join shuffles on the gram key whose
    cardinality the first aggregate already compacted; frequency-heavy
    grams are exactly the non-rare ones, so skew concentrates on rows
    the CASE discards cheaply. Docs with < 2 tokens have no bigrams and
    are not emitted.
    """
    toks = _tokens(text_col, token_split, lowercase)
    exploded = docs.select(
        F.col(id_col), F.explode(token_ngrams(toks, 2)).alias("g")
    ).where(F.col("g").isNotNull() & (F.length("g") > 0))
    dg = exploded.groupBy(id_col, "g").agg(F.count("*").alias("k"))
    model = dg.groupBy("g").agg(F.sum("k").alias("c"))
    rare_k = F.when(F.col("c") <= rare_max_count, F.col("k")).otherwise(F.lit(0))
    return (
        dg.join(model, "g")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(rare_k).alias("n_rare"),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_rare",
            F.round(
                F.col("n_rare").cast("double") / F.col("n_bigrams"), 6
            ).alias("rare_frac"),
        )
    )


def repetition_signals(
    text_col: str = "text",
    n: int = 2,
    token_split: str = r"\s+",
    lowercase: bool = True,
):
    """Row-local ``(dup_frac, top_share)`` column expressions — the same
    two signals as :func:`repetition_stats` but computed WITHOUT any
    shuffle, for use as a gate inside a hot pipeline stage (the stats
    variant groupBys per (doc, gram) — right for reporting, wrong for a
    filter that runs on 100 TB).

    ``dup_frac`` uses ``array_distinct``; ``top_share`` sorts the doc's
    gram array and folds a longest-equal-run accumulator over it with
    ``aggregate`` — linear in the doc's token count, fully JVM-side.
    Both are NULL for docs with no n-grams (< n tokens): a gate should
    treat no-signal as pass and length-filter separately.

    Equality with repetition_stats is pinned by
    tests/test_curate.py::TestRepetitionSignals.
    """
    toks = _tokens(text_col, token_split, lowercase)
    g = F.filter(
        token_ngrams(toks, n), lambda x: x.isNotNull() & (F.length(x) > 0)
    )
    total = F.size(g)
    dup_frac = F.when(
        total > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / total, 4
        ),
    )
    s = F.array_sort(g)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(s, zero, step, lambda acc: acc["best"])
    top_share = F.when(total > 0, F.round(top.cast("double") / total, 4))
    return dup_frac, top_share


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
    token_split: str = r"\s+",
    lowercase: bool = False,
) -> DataFrame:
    """Split each document into fixed-token training windows ->
    ``(doc_id, chunk_id, chunk_text, n_tokens)`` — the chunking step
    every pretraining / RAG-indexing pipeline runs before tokenizer
    packing or embedding.

    Windows start every ``stride = chunk_tokens - overlap`` tokens:
    chunk i covers tokens ``[i*stride, i*stride + chunk_tokens)``; the
    final window may be shorter (it is never dropped — truncating the
    tail silently loses corpus). Docs with no tokens emit nothing.

    Row-local: sequence + transform + posexplode over the token array —
    no shuffle, no UDF; chunking 100 TB is a map-only scan whose output
    row count is ~``n_tokens/stride`` per doc. (True cross-doc sequence
    PACKING — concatenating short docs to fill windows — is inherently
    order-dependent and belongs in the tokenizer's data loader, not a
    distributed engine; this operator is the standard chunk-per-doc
    precursor.)
    """
    if chunk_tokens < 1 or not (0 <= overlap < chunk_tokens):
        raise ValueError("need chunk_tokens >= 1 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        _tokens(text_col, token_split, lowercase), lambda t: F.length(t) > 0
    )
    n = F.size(toks)
    n_chunks = F.when(n > 0, F.floor((n - F.lit(1)) / F.lit(stride)) + 1).otherwise(
        F.lit(0)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    # sequence(0, -1) yields [0, -1] (descending) rather than an empty
    # array — gate the empty-doc case explicitly
    chunks = F.when(n_chunks > 0, chunks).otherwise(
        F.array().cast("array<array<string>>")
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_toks")
    ).select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(F.col("_toks"), " ").alias("chunk_text"),
        F.size(F.col("_toks")).cast("bigint").alias("n_tokens"),
    )


def mix_rates(
    docs: DataFrame,
    strata_cols: tuple[str, ...] = ("lang", "source"),
    cap: float = 0.25,
) -> DataFrame:
    """Corpus-mix rebalancing budget: per-stratum share of the corpus
    and the deterministic keep-rate that caps every stratum at ``cap``
    of the total -> ``(strata..., n_docs, share, keep_rate)``.

    ``keep_rate = min(1, cap / share)`` — over-represented strata are
    downsampled to the cap, everything else passes whole. Feed the rates
    straight into :func:`stratified_sample` for the actual row-level
    (hash-deterministic) downsample.

    Scale: one corpus-wide groupBy (map-side combined) reduces the input
    to stratum cardinality — a handful of rows — before the global
    window computes the total, so the single-partition window exchange
    moves only the aggregate, never data rows.
    """
    agg = docs.groupBy(*strata_cols).agg(F.count("*").alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        *strata_cols,
        "n_docs",
        F.round(F.col("n_docs").cast("double") / total, 6).alias("share"),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(cap) * total.cast("double") / F.col("n_docs"),
            ),
            4,
        ).alias("keep_rate"),
    )


def boilerplate_lines(
    pages: DataFrame,
    min_pages: int = 2,
    min_frac: float = 0.5,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-host boilerplate detection -> ``(host, line, n_pages, frac)``:
    trimmed non-empty text lines that appear on at least ``min_pages``
    distinct canonical pages AND at least ``min_frac`` of the host's
    pages — nav bars, cookie banners, copyright footers. CCNet cleans
    crawl text exactly this way (per-shard repeated-paragraph removal);
    keying by host makes the frequency signal sharp at any corpus size
    because boilerplate is a per-site template artifact.

    Distinct-page evidence (never raw occurrence counts), so re-fetches
    of one logical page and a line repeated within one page can't
    promote content to boilerplate. Two host-keyed aggregations + one
    host equi-join, all map-side combined; no driver-side state."""
    from deepex_spark.operators.urls import canonicalize_urls

    canon = canonicalize_urls(pages, url_col)
    lines = (
        canon.select(
            "host",
            F.col("canon_url").alias("page"),
            F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
        )
        .select("host", "page", F.trim(F.col("raw")).alias("line"))
        .where(F.col("line") != "")
    )
    per_line = lines.groupBy("host", "line").agg(
        F.count_distinct("page").alias("n_pages")
    )
    host_pages = canon.groupBy("host").agg(
        F.count_distinct("canon_url").alias("host_pages")
    )
    return (
        per_line.join(host_pages, "host")
        .where(
            (F.col("n_pages") >= min_pages)
            & (
                F.col("n_pages").cast("double") / F.col("host_pages")
                >= min_frac
            )
        )
        .select(
            "host",
            "line",
            "n_pages",
            F.round(
                F.col("n_pages").cast("double") / F.col("host_pages"), 6
            ).alias("frac"),
        )
    )


def strip_boilerplate(
    pages: DataFrame,
    min_pages: int = 2,
    min_frac: float = 0.5,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Remove detected boilerplate lines -> ``(url, clean_text)``, one
    row per input page (pages reduced to nothing keep an empty string —
    downstream length/quality filters see them, they don't vanish).

    Line normalization is shared with :func:`boilerplate_lines` (trim
    spaces, drop empties); surviving lines are re-joined in original
    order. Cost at scale: one (host, line) anti-join + one url-keyed
    re-assembly shuffle of the text body — two text-sized exchanges for
    a one-time cleaning pass, vs re-running every downstream stage over
    nav-bar tokens forever. The re-assembly sort is per-url array_sort
    (bounded by lines-per-doc), never a global order."""
    from deepex_spark.operators.urls import canonicalize_urls

    bl = boilerplate_lines(pages, min_pages, min_frac, url_col, text_col)
    canon = canonicalize_urls(pages, url_col)
    lines = (
        canon.select(
            F.col(url_col).alias("url"),
            "host",
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
        )
        .select("url", "host", "pos", F.trim(F.col("raw")).alias("line"))
        .where(F.col("line") != "")
    )
    kept = lines.join(bl.select("host", "line"), ["host", "line"], "left_anti")
    rebuilt = kept.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean_text")
    )
    return (
        pages.select(F.col(url_col).alias("url"))
        .distinct()
        .join(rebuilt, "url", "left")
        .select("url", F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-GLOBAL exact paragraph dedup, first-occurrence-wins ->
    ``(id, clean_text, total_paras, kept_paras)`` — one row per input
    document (a fully-deduplicated doc keeps an empty string, so
    downstream length filters see it rather than losing the row).

    RefinedWeb/Dolma-style curation: a paragraph (trimmed ``sep``-split
    piece; empties dropped) survives only in the single document that
    contains its FIRST occurrence, ordered by ``(id, position)`` — every
    later copy anywhere in the corpus (including later repeats inside
    the same document) is removed. Complements
    :func:`boilerplate_lines`, which is per-host frequency evidence:
    this is global and exact, catching cross-site mirrors and syndicated
    text that host-local frequency can never see.

    Scale shape (the 100 TB story): the winner per paragraph is a
    ``groupBy(md5(para)).agg(min(struct(id, pos)))`` — map-side partial
    aggregation crushes a hot paragraph (a banner repeated 10^9 times)
    to one row per map task BEFORE the exchange, which a
    ``row_number()`` window over the same key could not (a window ships
    every copy of the hot key to one task — the skew bomb this avoids).
    Winners join back on the 32-char digest (paragraph bytes don't ride
    the shuffle twice; AQE splits any residual join skew), and the
    rebuild is ONE id-keyed exchange with a per-doc ``array_sort`` —
    bounded by document size, never a global order."""
    paras = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "raw"),
        )
        .select("_id", "pos", F.trim(F.col("raw")).alias("para"))
        .where(F.col("para") != "")
        .withColumn("k", F.md5("para"))
    )
    winners = paras.groupBy("k").agg(
        F.min(F.struct(F.col("_id"), F.col("pos"))).alias("w")
    )
    marked = paras.join(winners, "k").withColumn(
        "keep",
        (F.col("w._id") == F.col("_id")) & (F.col("w.pos") == F.col("pos")),
    )
    rebuilt = marked.groupBy("_id").agg(
        F.count(F.lit(1)).alias("total_paras"),
        F.sum(F.col("keep").cast("long")).alias("kept_paras"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "keep", "para"))),
                    lambda x: x["keep"],
                ),
                lambda x: x["para"],
            ),
            sep,
        ).alias("clean_text"),
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .distinct()
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("total_paras", F.lit(0)).alias("total_paras"),
            F.coalesce("kept_paras", F.lit(0)).alias("kept_paras"),
        )
    )


def merge_span_stats(ps, window: int):
    """Fold a SORTED array of duplicated-window start positions (each
    covering ``[p, p + window)`` tokens) into interval-union statistics:
    a struct ``(n_spans, toks)`` — the count of maximal merged spans and
    their total token coverage. A position within ``window`` of the
    previous one extends the current span (adjacent windows touch
    exactly at ``prev + window``); anything further starts a new one.
    Row-local JVM ``aggregate`` — no UDF, no shuffle; empty input folds
    to ``(0, 0)``."""
    w = F.lit(window).cast("long")
    init = F.struct(
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("start"),
        F.lit(0).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("toks"),
    )
    return F.aggregate(
        ps,
        init,
        lambda acc, p: F.when(
            acc["n_spans"] == 0,
            F.struct(
                F.lit(1).cast("long").alias("n_spans"),
                p.cast("long").alias("start"),
                p.cast("long").alias("prev"),
                F.lit(0).cast("long").alias("toks"),
            ),
        )
        .when(
            p.cast("long") - acc["prev"] <= w,
            F.struct(
                acc["n_spans"].alias("n_spans"),
                acc["start"].alias("start"),
                p.cast("long").alias("prev"),
                acc["toks"].alias("toks"),
            ),
        )
        .otherwise(
            F.struct(
                (acc["n_spans"] + 1).alias("n_spans"),
                p.cast("long").alias("start"),
                p.cast("long").alias("prev"),
                (acc["toks"] + acc["prev"] + w - acc["start"]).alias("toks"),
            )
        ),
        lambda acc: F.when(
            acc["n_spans"] == 0,
            F.struct(
                F.lit(0).cast("long").alias("n_spans"),
                F.lit(0).cast("long").alias("toks"),
            ),
        ).otherwise(
            F.struct(
                acc["n_spans"].alias("n_spans"),
                (acc["toks"] + acc["prev"] + w - acc["start"]).alias("toks"),
            )
        ),
    )


def dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-GLOBAL duplicate-substring span detection — the
    suffix-array substring dedup of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), re-expressed at
    token-window granularity so it distributes: a ``window``-token
    sliding fingerprint replaces the suffix array, and any window whose
    fingerprint occurs ≥ ``min_count`` times ANYWHERE in the corpus
    (other docs or the same doc — both count, as in the paper) marks
    its token range duplicated; overlapping/adjacent duplicated ranges
    merge into maximal spans per doc.

    Output one row per doc that contains at least one duplicated span:
    ``(doc_id, n_tokens, n_dup_spans, n_dup_tokens, dup_ratio)`` —
    the per-doc numbers a curation gate thresholds on (drop, or strip
    the spans). Resolution is the window size: duplicated substrings
    shorter than ``window`` tokens are invisible, and a maximal span's
    boundary is window-quantized — the disclosed approximation that
    makes the computation one shuffle instead of a suffix array.

    Tokenization is the byte-literal single-space split the curation
    oracles pin (``string_split(text, ' ')``); windows touching an
    empty token are skipped but keep their positions (grams are built
    JVM-side by :func:`token_ngrams` slice-zipping — no UDF).

    Scale (100 TB): the window explode is ~one row per corpus TOKEN,
    but each row is only (docid, pos, 16-byte md5) — the text itself
    never ships. The occurrence count is a map-side-combined groupBy on
    the fingerprint; the flag-back join is fingerprint-keyed against a
    count-filtered (usually small) hot set, with AQE splitting any
    mega-hot fingerprint. The span merge is row-local: one per-doc
    sorted-positions fold (:func:`merge_span_stats` — positions ≤ doc
    tokens), no window function over the corpus.
    """
    toks = F.split(F.col(text_col), " ")
    grams = token_ngrams(toks, window)
    wins = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.posexplode(grams).alias("pos", "g"),
    ).where(F.col("g").isNotNull())
    wins = wins.select(
        id_col, "n_tokens", "pos", F.md5(F.col("g")).alias("fp")
    )
    hot = (
        wins.groupBy("fp")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("fp")
    )
    flagged = wins.join(hot, "fp").select(id_col, "n_tokens", "pos")
    per_doc = flagged.groupBy(id_col, "n_tokens").agg(
        F.sort_array(F.collect_list("pos")).alias("ps")
    )
    fold = merge_span_stats(F.col("ps"), window)
    return per_doc.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        fold.alias("_f"),
    ).select(
        id_col,
        "n_tokens",
        F.col("_f.n_spans").alias("n_dup_spans"),
        F.col("_f.toks").alias("n_dup_tokens"),
        F.round(F.col("_f.toks").cast("double") / F.col("n_tokens"), 6).alias(
            "dup_ratio"
        ),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition-matrix estimate over per-user event
    sequences -> ``(src_type, dst_type, n, p)``: for each observed state
    pair, the transition count and the row-normalized probability
    ``p = n / sum(n over src_type)``. The standard next-action /
    clickstream model feeding session simulation and anomaly baselines;
    pairs cross SESSION boundaries deliberately (gap semantics belong to
    ``sessionize`` — compose by feeding its output if per-session chains
    are wanted).

    Determinism: ordering ties on ``ts_col`` break by ``order_col``
    (unique), so the lead() sequence — and therefore every count — is a
    pure function of the data, same convention as ``sessionize``.

    Scale: one window exchange on the user key (a user's history fits a
    partition; AQE splits bot keys), one map-side-combinable (src, dst)
    count whose output is at most |states|^2 rows, and the row marginal
    as a WINDOW over those aggregated rows — not a groupBy+join back,
    which would re-derive the whole event-scan subtree for the second
    consumer (measured: the join form duplicates the big window stage in
    the physical plan; the window form costs one tiny exchange over
    |states|^2 rows). The probability divides exact BIGINTs, rounded
    once.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    seq = events.select(
        F.col(state_col).alias("src_type"),
        F.lead(state_col).over(w).alias("dst_type"),
    )
    pairs = (
        seq.where(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count("*").alias("n"))
    )
    t = F.sum("n").over(Window.partitionBy("src_type"))
    return pairs.select(
        "src_type",
        "dst_type",
        "n",
        F.round(F.col("n").cast("double") / t, 6).alias("p"),
    )


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
    token_split: str = " ",
    lowercase: bool = False,
) -> DataFrame:
    """Corpus collocations by pointwise mutual information ->
    ``(w1, w2, n_xy, pmi)``, the ``top_k`` adjacent token pairs ranked
    by ``pmi = ln(p(xy) / (p(x) p(y)))`` among pairs seen at least
    ``min_count`` times — Church & Hanks (1990) phrase mining, the
    standard first pass for multiword-expression vocabularies.

    Determinism: every count is an exact BIGINT; the PMI spends its
    float ops in ONE fixed expression tree over those integers (shared
    verbatim with the oracle) and is rounded before the rank, whose
    (pmi, w1, w2) tie-break is total — the same rounded-score-boundary
    convention as kg_link_pred_heuristic.

    Scale: one corpus pass builds BOTH gram tables (the bigram explode
    and the unigram explode read the same scan; each aggregate is
    map-side combined on its gram key), the corpus totals N1/N2 are
    1-row rollups OF those aggregates (no second source scan), the two
    marginal joins key on the unigram vocab (AQE broadcasts if it
    fits), and the ``min_count`` filter runs before the joins so hapax
    pairs — the vast majority — never shuffle twice. Final cut is
    TakeOrderedAndProject.
    """
    toks = _tokens(text_col, token_split, lowercase)
    width = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    zipped = F.zip_with(
        F.slice(toks, 1, width),
        F.slice(toks, 2, width),
        lambda a, b: F.when(
            (F.length(a) > 0) & (F.length(b) > 0), F.struct(a.alias("w1"), b.alias("w2"))
        ),
    )
    pairs = docs.select(F.explode(zipped).alias("p")).where(F.col("p").isNotNull())
    nxy = (
        pairs.select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_xy"))
        .where(F.col("n_xy") >= int(min_count))
    )
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    # corpus totals roll up the aggregates, not the corpus
    n1 = uni.agg(F.sum("n").alias("n1"))
    n2 = (
        pairs.select(F.count("*").alias("n2"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n").alias("n_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n").alias("n_y"))
    scored = (
        nxy.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            "n_xy",
            F.round(
                F.log(
                    (F.col("n_xy").cast("double") / F.col("n2"))
                    / (
                        (F.col("n_x").cast("double") / F.col("n1"))
                        * (F.col("n_y").cast("double") / F.col("n1"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(int(top_k))


def ewma_smooth(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    horizon: int = 8,
    alpha: float = 0.3,
) -> DataFrame:
    """Fixed-horizon EWMA smoothing of a per-user metric stream ->
    input rows + ``ewma``: the exponentially weighted mean of the last
    ``horizon`` observations, ``sum_k w_k * value_{t-k} / sum_k w_k``
    with ``w_k = (1-alpha)^k`` over the observations actually present
    (warm-up rows normalize over their shorter prefix — pandas
    ``ewm(adjust=True)`` semantics, truncated at the horizon). The
    standard smoothed-baseline primitive for rate/latency monitoring,
    as a row-local expression rather than a stateful scan.

    Determinism: the horizon is UNROLLED into one fixed expression tree
    of ``lag()`` terms — weight literals, left-associative additions,
    one division, one rounding — which an ANSI oracle can reproduce
    token-for-token, so float equality is exact (the repo's shared-
    expression-tree convention; an unbounded recursive EWMA would fold
    in engine-chosen order and drift). Unlike a collect_list +
    higher-order-function fold, lag() stays whole-stage-codegen'd and
    allocates no per-row arrays.

    Scale: ONE window exchange on the user key (AQE splits bot users);
    the ``horizon`` lag() columns share that single sort — Spark plans
    one Window node computing all eight, not eight passes. Output is
    row-per-input, no aggregation, no second shuffle.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    v = F.col(value_col)
    num = v * F.lit(1.0)
    den = F.lit(1.0)
    for k in range(1, int(horizon)):
        wk = (1.0 - alpha) ** k
        lk = F.lag(value_col, k).over(w)
        num = num + F.coalesce(lk, F.lit(0.0)) * F.lit(wk)
        den = den + F.when(lk.isNull(), F.lit(0.0)).otherwise(F.lit(wk))
    return events.withColumn("ewma", F.round(num / den, 6))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Okapi BM25 retrieval (Robertson & Walker 1994) of the ``top_k``
    documents per query -> ``(query_id, doc_id, n_terms, bm25, rk)``:
    ``queries`` is a ``(query_id, term)`` bag; each matched (query, doc,
    term) contributes ``idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
    with the Lucene-shaped ``idf = ln(1 + (N-df+0.5)/(df+0.5))`` (always
    positive, so stopword-heavy queries cannot produce negative terms).
    The sparse arm of hybrid retrieval — compose with ann_cosine_topk
    via ``rrf_fuse``-style rank fusion.

    Determinism: the per-term score is ONE fixed expression tree over
    exact integers (tf, df, dl, N) plus the corpus scalar avgdl, rounded
    to integer MICRO-UNITS (1e-6) before the per-(query, doc) sum — so
    the sum is exact BIGINT arithmetic, immune to fold order, and the
    oracle reproduces it token-for-token. The repo's rounded-before-
    aggregation convention taken one step further: rounding to integers
    makes even the aggregation itself order-free.

    Scale: tf/df/dl are the same map-side-combined aggregates tfidf
    builds (df derived FROM tf, dl FROM the same token explode — one
    corpus scan); the query-term join broadcasts the query bag (queries
    are small by definition; pass ``broadcast_queries=False`` for
    offline mega-batches, where AQE picks the strategy); N and avgdl
    are driver scalars (two counts, no rows). The final window is
    per-query, WindowGroupLimit-pruned to ``top_k`` rows.
    """
    terms = docs.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term")
    ).where(F.length("term") > 0)
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # df and dl both FOLD tf rather than re-deriving the token explode:
    # the three consumers then share one identical (doc, term) exchange
    # subtree, which Spark dedupes via ReusedExchange — the corpus is
    # scanned/exploded ONCE, not three times (plan-audited, EXPLAIN.md)
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    n_docs = docs.select(id_col).distinct().count()
    total_tokens = dl.agg(F.sum("dl")).collect()[0][0]
    avgdl = total_tokens / n_docs
    q = F.broadcast(queries) if broadcast_queries else queries
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    micro = F.round(idf * tf_part * F.lit(1000000.0)).cast("long")
    matched = (
        tf.join(q, "term")
        .join(df, "term")
        .join(dl, id_col)
        .select("query_id", F.col(id_col), micro.alias("micro"))
    )
    agg = matched.groupBy("query_id", id_col).agg(
        F.count("*").alias("n_terms"),
        F.round(F.sum("micro") / F.lit(1000000.0), 6).alias("bm25"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= int(top_k))
        .select("query_id", id_col, "n_terms", "bm25", "rk")
    )


def frequent_sequences(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    state_col: str = "event_type",
    length: int = 3,
    top_k: int = 50,
) -> DataFrame:
    """Top-k frequent CONTIGUOUS event sequences of a fixed length per
    the whole corpus -> ``(s1..sN, n, rk)``: the classic clickstream
    path-mining primitive (what 3-step flows dominate the product?),
    the fixed-length contiguous special case of PrefixSpan — which is
    the variant that scales: gap-allowing subsequence mining is
    exponential in candidates, while contiguous windows are one lead()
    chain, linear in the event log.

    Determinism: per-user ordering ties on ``ts_col`` break by the
    unique ``order_col`` (the sessionize/transitions convention);
    counts are exact BIGINTs; the (n DESC, s1..sN ASC) rank is total.

    Scale: ONE window exchange on the user key — all ``length-1``
    leads share the single sort (Spark compiles them into one Window
    node); the count is map-side combinable on the sequence tuple; the
    final cut is a TakeOrderedAndProject, no second wide shuffle.
    Sequences never cross users; they DO cross session gaps (compose
    with ``sessionize`` output keyed by session_id if gap semantics
    are wanted — same contract as ``event_transitions``).
    """
    if length < 2:
        raise ValueError("sequence length must be >= 2")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    cols = [F.col(state_col).alias("s1")] + [
        F.lead(state_col, k).over(w).alias(f"s{k + 1}") for k in range(1, int(length))
    ]
    names = [f"s{i + 1}" for i in range(int(length))]
    seq = events.select(*cols).where(
        F.col(names[-1]).isNotNull()
    )
    counted = seq.groupBy(*names).agg(F.count("*").alias("n"))
    ordered = counted.orderBy(F.desc("n"), *[F.asc(c) for c in names]).limit(int(top_k))
    w_rk = Window.orderBy(F.desc("n"), *[F.asc(c) for c in names])
    return ordered.withColumn("rk", F.row_number().over(w_rk))


def robust_zscores(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Median/MAD robust outlier scores per group -> input keys +
    ``(med, mad, z)`` with ``z = (v - med) / (1.4826 * mad)`` (the
    Hampel consistency constant for Gaussian data) — the outlier score
    that a single 10^6x spike cannot poison, unlike the mean/stddev
    z-score (events_anomaly_zscore) whose baseline the spike itself
    shifts. ``z`` is NULL when MAD = 0 (a majority-constant group has
    no robust scale).

    Determinism: the median is the LOWER-median ELEMENT — the row at
    position ``(n+1) div 2`` of the (value ASC) order — not an
    interpolated quantile: element picks are exact on both engines,
    whereas interpolation arithmetic ``(1-f)*a + f*b`` vs
    ``a + (b-a)*f`` differs by engine and would drift. Same pick for
    the MAD (lower median of |v - med|). The one float expression (the
    z rational) is a fixed tree, rounded once. row_number over tied
    values is order-ambiguous but VALUE-unambiguous — every rank
    permutation of equal values picks the same element value.

    Scale: two window exchanges on the group key (rank + count share
    each sort), two broadcast joins of the 1-row-per-group med/mad
    tables back onto the stream. No collect; group skew is the window
    exchange's problem and AQE splits it.
    """
    g, v = F.col(group_col), F.col(value_col)
    w_rn = Window.partitionBy(group_col).orderBy(value_col)
    w_all = Window.partitionBy(group_col)
    ranked = events.select(
        F.col(id_col), g, v,
        F.row_number().over(w_rn).alias("_rn"),
        F.count("*").over(w_all).alias("_cnt"),
    )
    med = (
        ranked.where(F.col("_rn") == F.expr("(_cnt + 1) div 2"))
        .select(g.alias("_g"), v.alias("med"))
    )
    with_med = events.select(F.col(id_col), g, v).join(
        F.broadcast(med), g == F.col("_g")
    ).drop("_g").withColumn("dev", F.abs(v - F.col("med")))
    w_rn2 = Window.partitionBy(group_col).orderBy("dev")
    ranked2 = with_med.select(
        "*",
        F.row_number().over(w_rn2).alias("_rn"),
        F.count("*").over(w_all).alias("_cnt"),
    )
    mad = (
        ranked2.where(F.col("_rn") == F.expr("(_cnt + 1) div 2"))
        .select(g.alias("_g"), F.col("dev").alias("mad"))
    )
    out = with_med.join(F.broadcast(mad), g == F.col("_g")).drop("_g")
    z = F.when(
        F.col("mad") > 0,
        F.round((v - F.col("med")) / (F.lit(1.4826) * F.col("mad")), 6),
    )
    return out.select(F.col(id_col), g, v, "med", "mad", z.alias("z"))


def cusum_shifts(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    slack: float = 0.5,
    threshold: float = 3.0,
) -> DataFrame:
    """One-sided CUSUM upward-shift detection over per-group DAILY
    volumes -> ``(event_type, d, n, cusum, is_shift)`` (Page 1954):
    ``S_k = max(0, S_{k-1} + (x_k - mu - slack*sigma-ish))`` flags a
    sustained level shift that a spike-local z-score misses. ``mu`` is
    the group's own mean daily volume; ``slack`` and ``threshold`` are
    in units of that mean (self-normalizing, no variance estimate —
    the pragmatic crawl-ops parameterization).

    Determinism — the interesting part: the CUSUM recursion looks
    stateful, but it has the closed form ``S_k = RS_k - min_{j<=k}
    RS_j`` where ``RS`` is the running sum of ``(x_k - mu - slack*mu)``
    — two window functions, no recursion. And by scaling to integer
    MICRO-UNITS first (counts are exact; ``mu`` rounds to micro-units
    once), every running sum and running min is exact BIGINT
    arithmetic: no float accumulates anywhere, so window-sum evaluation
    order (sequential fold vs segment tree) cannot matter on either
    engine. One final division + rounding produces the reported float.

    Scale: the daily rollup is a map-side-combined (group, day)
    aggregate; mu is a window over the |groups|×|days|-bounded rollup;
    the two running windows order by day within group — all three
    windows share one group-key exchange of the ALREADY-AGGREGATED
    rows. The raw event log is touched exactly once.
    """
    g = F.col(group_col)
    daily = (
        events.groupBy(group_col, F.date_trunc("day", ts_col).alias("d"))
        .agg(F.count("*").alias("n"))
    )
    w_all = Window.partitionBy(group_col)
    w_ord = Window.partitionBy(group_col).orderBy("d")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    # mu in micro-units: sum/count over exact BIGINTs, one round
    mu_micro = F.round(
        F.sum("n").over(w_all) * F.lit(1000000.0) / F.count("*").over(w_all)
    ).cast("long")
    contrib = (
        F.col("n") * F.lit(1000000)
        - mu_micro
        - F.round(F.lit(float(slack)) * mu_micro).cast("long")
    )
    stepped = daily.select(
        g, F.col("d"), F.col("n"), contrib.alias("c"), mu_micro.alias("mu_micro")
    )
    stepped = stepped.withColumn("rs", F.sum("c").over(w_run))
    # S_k = RS_k - min(0, RS_1..RS_k): the min must include the empty
    # prefix (S_0 = 0), hence the least() against 0. Two selects — the
    # running min is OVER the materialized running-sum column (window
    # functions don't nest); both windows still share one exchange.
    s_micro = F.col("rs") - F.least(
        F.min("rs").over(w_run), F.lit(0).cast("long")
    )
    out = stepped.select(
        g,
        "d",
        "n",
        F.round(s_micro / F.lit(1000000.0), 6).alias("cusum"),
        (
            s_micro
            > F.round(F.lit(float(threshold)) * F.col("mu_micro")).cast("long")
        ).alias("is_shift"),
    )
    return out


def volume_trends(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group least-squares trend of DAILY volume over calendar time
    -> ``(event_type, n_days, slope, intercept, r2)``: the "is this
    source decaying" primitive — slope in events/day over epoch-day x,
    so gaps in the calendar count as real elapsed time (a row-index x
    would silently compress outages).

    Determinism: every regression moment (n, Σx, Σy, Σx², Σxy, Σy²) is
    an exact BIGINT over integer epoch-days and integer counts —
    aggregation order cannot matter — and slope/intercept/r² are fixed
    rational expressions over those moments, each rounded once:
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)``. Degenerate groups
    (single day: zero x-variance; constant volume: zero y-variance for
    r²) yield NULL rather than a float artifact.

    Scale: the daily rollup is the only pass over the event log
    (map-side combined); the moment aggregate runs on the
    |groups|×|days|-bounded rollup; output is one row per group.
    BIGINT overflow horizon: Σx² at epoch-day ~2·10⁴ is ~4·10⁸ per
    row — 10¹⁰ group-days before approaching 2⁶³, disclosed rather
    than silently promoted.
    """
    g = F.col(group_col)
    daily = (
        events.groupBy(group_col, F.date_trunc("day", ts_col).alias("d"))
        .agg(F.count("*").alias("y"))
        .withColumn("x", F.datediff(F.col("d"), F.lit("1970-01-01")).cast("long"))
    )
    m = daily.groupBy(group_col).agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_days")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(
        varx_n > 0, F.round(cov_n / varx_n.cast("double"), 6)
    )
    intercept = F.when(
        varx_n > 0,
        F.round(
            (F.col("sy") - cov_n / varx_n.cast("double") * F.col("sx")) / n, 6
        ),
    )
    # r² factors cast to double BEFORE multiplying: cov² and varx·vary
    # in BIGINT overflow around |cov| ~ 3·10⁹ (ANSI mode would error,
    # not corrupt — but the double product is exact enough for an r²
    # and never traps); the oracle mirrors the cast placement
    cov_d = cov_n.cast("double")
    r2 = F.when(
        (varx_n > 0) & (vary_n > 0),
        F.round(
            (cov_d * cov_d) / (varx_n.cast("double") * vary_n.cast("double")), 6
        ),
    )
    return m.select(
        g, "n_days", slope.alias("slope"), intercept.alias("intercept"), r2.alias("r2")
    )


def bot_flags(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    min_gaps: int = 5,
    max_cv2: float = 0.1,
) -> DataFrame:
    """Automation/bot heuristic from inter-event timing regularity ->
    ``(user_id, n_gaps, mean_gap_s, cv2, is_bot)``: humans produce
    bursty, high-variance gaps; schedulers and crawlers produce
    metronomic ones. A user with at least ``min_gaps`` gaps whose
    squared coefficient of variation ``cv2 = var/mean² =
    (nΣg² − (Σg)²)/(Σg)²`` falls below ``max_cv2`` flags as a bot —
    the pre-filter you run before attributing event volume or feeding
    per-user text into a training corpus.

    Determinism: gaps are exact integer SECONDS (epoch-microsecond
    difference floor-divided by 10⁶ — identical integer division both
    engines; whole seconds keep Σg² far from the BIGINT edge for any
    plausible log, and the disclosed cv2 cast-to-double placement
    handles the rest identically on both sides); the moment sums are
    exact BIGINTs and cv2 is one fixed expression, rounded once. Users
    with zero mean gap (all events in the same second) get cv2 = 0 —
    maximally regular, flagged when n_gaps suffices.

    Scale: one user-key window for the lag (ordering ties broken by
    the unique ``order_col``), one map-side-combined moment aggregate,
    one row per user out. Same single-exchange shape as sessionize.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    ts = F.col(ts_col)
    # timestamp SUBTRACTION -> day-time interval -> long = whole seconds
    # (truncated): timezone-free on TIMESTAMP_NTZ (the sessionize
    # convention — unix_micros() would reject NTZ / bind a session zone),
    # and for non-negative gaps truncation == the oracle's floor-div
    gap_s = (ts - F.lag(ts).over(w)).cast("long")
    gaps = events.select(F.col(user_col), gap_s.alias("g")).where(
        F.col("g").isNotNull()
    )
    m = gaps.groupBy(user_col).agg(
        F.count("*").alias("n_gaps"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    n_d = F.col("n_gaps").cast("double")
    sg_d = F.col("sg").cast("double")
    sgg_d = F.col("sgg").cast("double")
    cv2 = F.when(
        F.col("sg") > 0,
        F.round((n_d * sgg_d - sg_d * sg_d) / (sg_d * sg_d), 6),
    ).otherwise(F.lit(0.0))
    out = m.select(
        F.col(user_col),
        "n_gaps",
        F.round(sg_d / n_d, 6).alias("mean_gap_s"),
        cv2.alias("cv2"),
    )
    return out.withColumn(
        "is_bot",
        (F.col("n_gaps") >= int(min_gaps)) & (F.col("cv2") < float(max_cv2)),
    )


def distribution_drift(
    pop_a: DataFrame,
    pop_b: DataFrame,
    text_col: str = "text",
    bucket_width: int = 50,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two corpus slices over a
    doc-length histogram -> per-bucket ``(bucket, n_a, n_b, psi_term)``
    plus the total ``psi`` repeated on every row: the standard
    drift-monitoring metric ("did this week's crawl change shape?"),
    with the usual read: psi < 0.1 stable, 0.1-0.25 shifting, > 0.25
    drifted. Buckets are fixed-width word-count bins capped at
    ``n_buckets`` (the top bin absorbs the tail); a Laplace +1 smooth
    over the full bucket spine keeps empty bins finite — and because
    BOTH sides smooth, a bucket empty in both contributes ~0, not a
    fabricated signal.

    Determinism: bucket counts are exact BIGINTs; each bucket's
    ``(p−q)·ln(p/q)`` term is ONE fixed expression over those integers
    rounded to integer NANO-units, so the cross-bucket total is exact
    BIGINT addition — fold-order-free (the BM25/CUSUM convention; PSI
    terms are tiny, hence nano not micro). p and q derive from counts
    via one division each — identical IEEE ops both engines.

    Scale: one map-side-combined bucket aggregate per population (the
    corpus passes), a broadcast-sized join on the ≤ n_buckets spine,
    and a window over ≤ n_buckets rows for the total. The spine is
    generated, not collected.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        words = F.split(F.col(text_col), r"\s+")
        n_words = F.size(F.filter(words, lambda w: F.length(w) > 0))
        bucket = F.least(
            (n_words / F.lit(int(bucket_width))).cast("long"),
            F.lit(int(n_buckets) - 1),
        )
        return df.select(bucket.alias("bucket")).groupBy("bucket").agg(
            F.count("*").alias(name)
        )
    spine = (
        pop_a.sparkSession.range(int(n_buckets)).select(F.col("id").alias("bucket"))
    )
    joined = (
        spine.join(counts(pop_a, "n_a"), "bucket", "left")
        .join(counts(pop_b, "n_b"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("n_a"), F.lit(0).cast("long")).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0).cast("long")).alias("n_b"),
        )
    )
    w_all = Window.partitionBy()
    ta = F.sum("n_a").over(w_all)
    tb = F.sum("n_b").over(w_all)
    p = (F.col("n_a") + F.lit(1.0)) / (ta + F.lit(float(n_buckets)))
    q = (F.col("n_b") + F.lit(1.0)) / (tb + F.lit(float(n_buckets)))
    nano = F.round((p - q) * F.log(p / q) * F.lit(1000000000.0)).cast("long")
    terms = joined.select("bucket", "n_a", "n_b", nano.alias("_nano"))
    total = F.sum("_nano").over(Window.partitionBy())
    return terms.select(
        "bucket",
        "n_a",
        "n_b",
        F.round(F.col("_nano") / F.lit(1000000000.0), 6).alias("psi_term"),
        F.round(total / F.lit(1000000000.0), 6).alias("psi"),
    )
