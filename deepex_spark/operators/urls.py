"""URL canonicalization and crawl-snapshot dedup over the input_hint
pages table ``(url, warc_ts, html, text, lang)``.

A Common-Crawl-style corpus re-fetches the same logical page under many
surface URLs (scheme/host case, ``www.`` prefix, default ports, trailing
slashes, fragments, tracking query params, param order). Canonicalizing
before dedup/partitioning is the first thing a 100 TB crawl pipeline does:
the north rule partitions ingest by url-hash, and hashing the RAW url
splits one logical page across partitions while double-counting it in
every per-page statistic.

Normalization spec (applied in this exact order; mirrored token-for-token
by the DuckDB oracle in queries.py, and deliberately conservative — only
transformations that preserve dereference semantics for well-behaved
servers):

1. strip the fragment (``#...`` — never sent to the server);
2. lowercase the ``scheme://authority`` prefix ONLY (paths are
   case-sensitive, hosts/schemes are not — RFC 3986 §6.2.2.1);
3. drop a leading ``www.`` on the host;
4. drop the scheme's default port (``:80`` http, ``:443`` https; other
   ports are meaningful and kept);
5. strip trailing slashes from the path;
6. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``), sort
   the survivors byte-wise, drop the ``?`` if none survive.

Known deviation: step 2 case-folds the WHOLE authority, including any
``user:pass@`` userinfo (which RFC 3986 keeps case-sensitive). Crawl
corpora exclude credentialed URLs as a matter of policy, so the spec
trades that corner for a one-regex prefix rule; :func:`url_host` does
cut userinfo so per-host rollups are never split by it.

Everything is JVM-side column algebra (regexp/split/array_sort — no UDF,
no shuffle): canonicalization is a row-local map and scales
embarrassingly. ``crawl_snapshot`` then keeps the newest fetch per
canonical URL — the same WindowGroupLimit keep-newest shape as
``dedup_keep_newest`` (partial per-partition top-1 before the one
canon_url exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid)(=|$)"


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module spec — a pure column
    expression (codegen'd, row-local)."""
    nofrag = F.regexp_replace(url, "#.*", "")
    prefix_raw = F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*", 0)
    rest = nofrag.substr(F.length(prefix_raw) + F.lit(1), F.length(nofrag))
    prefix = F.lower(prefix_raw)
    prefix = F.regexp_replace(prefix, r"^(https?://)www\.", r"$1")
    prefix = (
        F.when(prefix.startswith("http://"), F.regexp_replace(prefix, ":80$", ""))
        .when(prefix.startswith("https://"), F.regexp_replace(prefix, ":443$", ""))
        .otherwise(prefix)
    )
    qpos = F.instr(rest, "?")
    path = F.when(qpos == 0, rest).otherwise(rest.substr(F.lit(1), qpos - F.lit(1)))
    path = F.regexp_replace(path, "/+$", "")
    query = F.when(qpos == 0, F.lit("")).otherwise(
        rest.substr(qpos + F.lit(1), F.length(rest))
    )
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q2 = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        prefix,
        path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )


def url_host(url: Column) -> Column:
    """Port-stripped lowercase host of the CANONICAL url (apply to
    :func:`normalize_url` output; on a raw url the casing/www may
    remain). Userinfo (``user:pass@``), if present, is cut — the host is
    the authority AFTER the last ``@`` — so credentials can never split
    one domain's rows across phantom hosts in per-host rollups."""
    return F.regexp_replace(
        F.regexp_extract(url, r"^[a-z0-9+.\-]+://(?:[^/?]*@)?([^/?@]*)", 1),
        ":[0-9]+$",
        "",
    )


def surt(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a CANONICAL
    url — the key scheme CDX web-archive indexes sort and range-scan by:
    same-domain records become one contiguous key range, so "all of
    ``*.example.org``" is a prefix scan instead of a full-index filter.

    Spec (this module's dialect, mirrored by the ``warc_cdx_index``
    DuckDB oracle):

    1. host = lowercase authority after the last ``@``, minus any
       ``:port`` (apply to :func:`normalize_url` output, which already
       dropped default ports and ``www.`` — a surviving port is
       non-default and re-appended in step 3);
    2. reverse the host's dot-segments and join with commas
       (``news.example.org`` -> ``org,example,news``);
    3. append ``:port`` if one survived canonicalization;
    4. append ``)`` then the path+query exactly as canonicalized
       (default ``/`` when empty).

    Pure row-local column algebra — at index-build scale this runs
    inside the scan projection.
    """
    authority = F.regexp_extract(url, r"^[a-z0-9+.\-]+://(?:[^/?]*@)?([^/?@]*)", 1)
    host = F.regexp_replace(authority, ":[0-9]+$", "")
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_replace(url, r"^[a-z0-9+.\-]+://[^/?]*", "")
    return F.concat(
        rev,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        F.when(rest == "", F.lit("/")).otherwise(rest),
    )


def canonicalize_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canon_url`` and ``host`` columns. Row-local — no shuffle."""
    canon = normalize_url(F.col(url_col))
    return pages.withColumn("canon_url", canon).withColumn("host", url_host(canon))


def crawl_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    with_counts: bool = True,
) -> DataFrame:
    """Latest fetch per canonical URL -> ``(canon_url, url, warc_ts
    [, n_variants])``: the crawl-snapshot compaction run before any
    per-page processing (otherwise re-fetches of one logical page are
    processed — and counted — n times).

    Newest ``ts_col`` wins; exact-timestamp ties break by raw url
    ascending so the kept row is deterministic. One canon_url exchange
    shared by both window functions. The variant count needs every row
    of a group, which (correctly) suppresses Spark's WindowGroupLimit
    partial top-1 — pass ``with_counts=False`` when you only need the
    kept rows: the rank-only plan pushes a per-partition top-1 below the
    exchange, so the shuffle carries one candidate per canonical url per
    input partition instead of every fetch.
    """
    ranked = _rank_newest(
        canonicalize_urls(pages, url_col).select("canon_url", url_col, ts_col),
        url_col,
        ts_col,
    )
    if with_counts:
        ranked = ranked.withColumn(
            "n_variants", F.count("*").over(Window.partitionBy("canon_url"))
        )
    out_cols = ["canon_url", url_col, ts_col] + (
        ["n_variants"] if with_counts else []
    )
    return ranked.where(F.col("_rn") == 1).select(*out_cols)


def _rank_newest(df: DataFrame, url_col: str, ts_col: str) -> DataFrame:
    """Shared keep-newest rank over ``canon_url`` (newest ``ts_col``,
    ties by raw url asc) — the ONE place the tie-break order lives, so
    crawl_snapshot and dedup_refetches cannot silently diverge."""
    w = Window.partitionBy("canon_url").orderBy(F.desc(ts_col), F.asc(url_col))
    return df.withColumn("_rn", F.row_number().over(w))


def host_stats(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-host crawl statistics -> ``(host, n_fetches, n_pages,
    refetch_ratio, last_fetch)``: the per-domain rollup crawl curation
    runs to spot over-crawled/boilerplate-heavy hosts and set per-domain
    budgets (``n_pages`` = distinct canonical urls; ``refetch_ratio`` =
    fetches per logical page).

    One map-side-combined groupBy per host after the row-local
    canonicalization — distinct canonical urls via an exact
    count_distinct (per-host cardinalities are bounded by the host's
    page count; swap in approx_count_distinct when hosts reach 10^8
    pages and the exact distinct's per-group hash set no longer fits).
    """
    return (
        canonicalize_urls(pages, url_col)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.count_distinct(F.col("canon_url")).alias("n_pages"),
            F.round(
                F.count("*").cast("double") / F.count_distinct(F.col("canon_url")), 4
            ).alias("refetch_ratio"),
            F.max(ts_col).alias("last_fetch"),
        )
    )


def dedup_refetches(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Ingest-time re-fetch dedup: keep the newest full page row per
    canonical url and RE-KEY it by the canonical url (``url_col`` is
    REPLACED by the canonical form; schema otherwise unchanged), so every
    downstream docid — checkpoints, lineage, triples — is stable across
    surface re-fetches of the same logical page.

    The same keep-newest semantics as :func:`crawl_snapshot` (newest
    ``ts_col``, ties by raw url asc) but carrying the full row. Rank-only
    window, so WindowGroupLimit cuts duplicate payloads per-partition
    BEFORE the one canon_url exchange. That exchange moves the full page
    payload once — an extra full shuffle vs skipping dedup, which is the
    right trade whenever per-page processing (the extraction kernel —
    dominant by orders of magnitude) exceeds one shuffle pass: at typical
    crawl re-fetch rates every duplicate page processed is pure waste.
    """
    cols = pages.columns
    return (
        _rank_newest(canonicalize_urls(pages, url_col), url_col, ts_col)
        .where(F.col("_rn") == 1)
        .select(
            *[
                F.col("canon_url").alias(url_col) if c == url_col else F.col(c)
                for c in cols
            ]
        )
    )


# ---------------------------------------------------------------------------
# HTML outlink extraction -> web link graph
# ---------------------------------------------------------------------------

# quoted href attribute of an <a ...> tag, case-insensitive; the negated
# classes cross newlines (no dotall needed), the lazy [^>]*? stays inside
# one tag. RE2 (DuckDB) and java.util.regex (Spark) both support (?i) and
# lazy repetition, so the SQL oracle reuses these strings verbatim.
HREF_DQ_RE = r'(?i)<a[\s][^>]*?href\s*=\s*"([^"]*)"'
HREF_SQ_RE = r"(?i)<a[\s][^>]*?href\s*=\s*'([^']*)'"
# a href that carries its own scheme (RFC 3986 scheme grammar)
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def extract_hrefs(html: Column) -> Column:
    """All quoted ``href`` values of ``<a>`` tags in ``html`` (binary,
    UTF-8), in document order (double-quoted then single-quoted form).
    Unquoted hrefs are NOT extracted — a documented spec bound; crawl
    HTML is overwhelmingly quoted and the regex stays oracle-portable."""
    h = html.cast("string")
    return F.concat(
        F.regexp_extract_all(h, F.lit(HREF_DQ_RE), 1),
        F.regexp_extract_all(h, F.lit(HREF_SQ_RE), 1),
    )


def resolve_href(src_canon: Column, href: Column) -> Column:
    """Absolute URL for ``href`` found on page ``src_canon`` (a
    :func:`normalize_url` output), or NULL when the href is not an
    http(s) outlink. Resolution spec (mirrored by the DuckDB oracle and
    the pure-Python reference in tests/test_outlinks.py):

    1. trim ASCII spaces (0x20) from both ends;
    2. NULL for '' / fragment-only ('#...') hrefs;
    3. a href with its own scheme: kept as-is when http/https,
       NULL otherwise (mailto:, javascript:, tel:, data:, ftp:, ...);
    4. protocol-relative ('//host/...'): src scheme + ':' + href;
    5. root-relative ('/...'): src origin + href;
    6. anything else is path-relative: src directory (origin + path up
       to and including the last '/', '/' when the path is empty) + href.

    Deviation from RFC 3986 §5.2 (documented): dot segments ('./', '../')
    are NOT normalized away — the joined form is emitted verbatim, and
    normalize_url downstream keeps them. Both oracle arms share the
    deviation, and tests cross-check against urllib.parse.urljoin on the
    dot-segment-free population.
    """
    t = F.trim(href)
    scheme = F.regexp_extract(src_canon, r"^([a-z][a-z0-9+.\-]*):", 1)
    origin = F.regexp_extract(src_canon, r"^[a-z][a-z0-9+.\-]*://[^/?]*", 0)
    rest = src_canon.substr(F.length(origin) + F.lit(1), F.length(src_canon))
    qpos = F.instr(rest, "?")
    path0 = F.when(qpos == 0, rest).otherwise(rest.substr(F.lit(1), qpos - F.lit(1)))
    srcdir = F.when(path0 == "", F.lit("/")).otherwise(
        F.regexp_replace(path0, "[^/]*$", "")
    )
    return (
        F.when((t == "") | t.startswith("#"), F.lit(None))
        .when(t.rlike(_SCHEME_RE) & t.rlike(r"(?i)^https?:"), t)
        .when(t.rlike(_SCHEME_RE), F.lit(None))
        .when(t.startswith("//"), F.concat(scheme, F.lit(":"), t))
        .when(t.startswith("/"), F.concat(origin, t))
        .otherwise(F.concat(origin, srcdir, t))
    )


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Distinct canonical web-graph edges from anchor tags ->
    ``(src_canon, src_host, dst_canon, dst_host)``.

    The whole chain is row-local JVM column algebra (regexp extract +
    explode + the normalize_url string pipe — no UDF, no Python), so at
    100 TB it runs entirely inside the scan stage's codegen; the only
    exchange is the final edge-level distinct, which is exactly the
    dedup a link graph needs anyway (repeated anchors on one page and
    surface re-fetches of one logical page collapse to one edge).
    """
    canon = canonicalize_urls(pages, url_col)
    href = F.explode(extract_hrefs(F.col(html_col))).alias("href")
    edges = canon.select(
        F.col("canon_url").alias("src_canon"),
        F.col("host").alias("src_host"),
        href,
    ).withColumn("dst_abs", resolve_href(F.col("src_canon"), F.col("href")))
    dst = normalize_url(F.col("dst_abs"))
    return (
        edges.where(F.col("dst_abs").isNotNull())
        .select(
            "src_canon",
            "src_host",
            dst.alias("dst_canon"),
            url_host(dst).alias("dst_host"),
        )
        .distinct()
    )


def host_link_graph(edges: DataFrame) -> DataFrame:
    """Host-level web graph from :func:`extract_outlinks` edges ->
    ``(src_host, dst_host, n_edges, n_dst_pages)``. One map-side-combined
    groupBy; ``n_edges`` counts distinct canonical page-level edges (the
    input is already distinct), ``n_dst_pages`` distinct link targets.
    Self-pairs (intra-host navigation) are kept — callers filter
    ``src_host != dst_host`` for the inter-host graph."""
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_edges"),
        F.count_distinct("dst_canon").alias("n_dst_pages"),
    )


# anchor (href, inner-text) pairs: same tag grammar as HREF_*_RE plus the
# closing '>' and the text up to the FIRST '<' (nested markup inside the
# anchor truncates the text to '' — a documented spec bound; both regexes
# are RE2- and java.util.regex-portable, so the SQL oracle reuses them
# verbatim). Extracting group 1 and group 2 with the SAME regex yields
# positionally aligned lists in both engines — zipped, never re-matched.
ANCHOR_DQ_RE = r'(?i)<a[\s][^>]*?href\s*=\s*"([^"]*)"[^>]*>([^<]*)'
ANCHOR_SQ_RE = r"(?i)<a[\s][^>]*?href\s*=\s*'([^']*)'[^>]*>([^<]*)"
# explicit ASCII whitespace class: java \s includes \x0B, RE2 \s does not —
# spelling the class out keeps Spark and the SQL oracle byte-identical
WS_RUN_RE = "[ \t\n\f\r]+"


def normalize_alias(txt: Column) -> Column:
    """Anchor text -> dictionary alias: collapse ASCII whitespace runs to
    one space, trim, lowercase. Surface variants ('  Apache  SPARK ',
    'apache\\nspark') collapse to one key; '' means no usable alias."""
    return F.lower(F.trim(F.regexp_replace(txt, WS_RUN_RE, " ")))


def extract_anchor_pairs(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Anchor-text mentions -> ``(src_canon, src_host, dst_canon,
    alias)``: one row per anchor whose href resolves to an http(s) url
    and whose normalized inner text is non-empty.

    This is the raw material of the entity-linking alias dictionary
    (DeepEx links mentions against an alias->entity table, reference
    `src/deepex/model/linking` semantics re-created in
    operators/linking.py): on the web, anchor text is THE free supervised
    alias source — people label link targets with the name they call the
    entity. Row-local JVM column algebra end to end (regex pair
    extraction, positional zip, scheme/origin resolution, canonicalize) —
    no UDF, no shuffle; at 100 TB this runs inside the scan stage's
    codegen exactly like :func:`extract_outlinks`."""
    canon = canonicalize_urls(pages, url_col)
    h = F.col(html_col).cast("string")
    hrefs = F.concat(
        F.regexp_extract_all(h, F.lit(ANCHOR_DQ_RE), 1),
        F.regexp_extract_all(h, F.lit(ANCHOR_SQ_RE), 1),
    )
    txts = F.concat(
        F.regexp_extract_all(h, F.lit(ANCHOR_DQ_RE), 2),
        F.regexp_extract_all(h, F.lit(ANCHOR_SQ_RE), 2),
    )
    pairs = canon.select(
        F.col("canon_url").alias("src_canon"),
        F.col("host").alias("src_host"),
        F.explode(F.arrays_zip(hrefs.alias("href"), txts.alias("txt"))).alias("p"),
    )
    resolved = (
        pairs.withColumn("dst_abs", resolve_href(F.col("src_canon"), F.col("p.href")))
        .withColumn("alias", normalize_alias(F.col("p.txt")))
        .where(F.col("dst_abs").isNotNull() & (F.col("alias") != ""))
    )
    dst = normalize_url(F.col("dst_abs"))
    return resolved.select(
        "src_canon", "src_host", dst.alias("dst_canon"), "alias"
    )


def mine_anchor_aliases(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Alias evidence table -> ``(alias, dst_canon, n_pages, n_hosts)``:
    how many distinct pages / hosts label target ``dst_canon`` with
    ``alias``. Distinct counts (not raw anchor counts) so surface
    re-fetches of one logical page and repeated anchors on one page can
    never inflate the signal. ONE map-side-combined exchange on
    (alias, dst_canon); generic mega-aliases ('more', 'here') spread
    across their many targets rather than concentrating in one group."""
    return extract_anchor_pairs(pages, url_col, html_col).groupBy(
        "alias", "dst_canon"
    ).agg(
        F.count_distinct("src_canon").alias("n_pages"),
        F.count_distinct("src_host").alias("n_hosts"),
    )


def anchor_alias_dict(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_pages: int = 1,
) -> DataFrame:
    """Entity-linking alias dictionary -> ``(alias, dst_canon, n_pages,
    n_hosts, confidence)``: the dominant target per alias (most distinct
    linking pages, ties by dst_canon asc so the kept row is
    deterministic) with ``confidence`` = its share of the alias's total
    page-evidence. ``min_pages`` cuts one-off aliases at scale.

    One alias-keyed exchange shared by the total and the argmax ranking;
    the output is exactly the small side the linking stage broadcasts
    (operators/linking.py joins mentions against an alias dictionary) —
    this closes the loop from raw crawl HTML to the linking stage's
    dictionary with no hand-curated input."""
    agg = mine_anchor_aliases(pages, url_col, html_col)
    w = Window.partitionBy("alias")
    ranked = agg.withColumn("tot", F.sum("n_pages").over(w)).withColumn(
        "_rn",
        F.row_number().over(w.orderBy(F.desc("n_pages"), F.asc("dst_canon"))),
    )
    return ranked.where(
        (F.col("_rn") == 1) & (F.col("n_pages") >= min_pages)
    ).select(
        "alias",
        "dst_canon",
        "n_pages",
        "n_hosts",
        F.round(F.col("n_pages").cast("double") / F.col("tot"), 6).alias(
            "confidence"
        ),
    )


def crawl_frontier(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Frontier discovery for the next crawl round -> ``(dst_canon,
    dst_host, n_inlinks, n_src_hosts)``: canonical outlink targets NOT in
    the crawled set, ranked by distinct linking pages and linking hosts
    (the standard frontier-prioritization signals — many independent
    in-links = fetch first).

    One left-anti join of the distinct edge targets against the distinct
    crawled canonical urls, both sides keyed on canon_url — at crawl
    scale both are url-hash-partitionable on the same key, and the
    per-target rollup is map-side combined. Self-contained pages that
    link only to crawled urls contribute nothing; zero-outlink pages
    cost one empty regex pass."""
    edges = extract_outlinks(pages, url_col, html_col)
    crawled = canonicalize_urls(pages, url_col).select(
        F.col("canon_url").alias("dst_canon")
    ).distinct()
    return (
        edges.join(crawled, "dst_canon", "left_anti")
        .groupBy("dst_canon", "dst_host")
        .agg(
            F.count("*").alias("n_inlinks"),
            F.count_distinct("src_host").alias("n_src_hosts"),
        )
    )


# ---------------------------------------------------------------------------
# HTML -> plain text extraction (the north-star ingest stage: the text
# column of the pages table is DERIVED from html, byte-identical per url
# to an independent DOM-based rendering of the same spec)
# ---------------------------------------------------------------------------

# The extraction spec is this ordered replacement chain. Every pattern is
# portable across java.util.regex (Spark), RE2 (DuckDB) and Python `re`
# — no backreferences (RE2 lacks them), no `\s` (Java includes \x0B,
# RE2 does not: explicit classes instead), inline (?i)/(?s) flags only.
# The SQL oracle and the pure-Python mirror in tests reuse these strings
# verbatim, so all three engines execute the identical spec.
_NL = "\n"
_BLOCK_TAGS = (
    "p|div|li|tr|h[1-6]|ul|ol|table|blockquote|section|article|"
    "header|footer|title|pre"
)
HTML_TEXT_STEPS: list[tuple[str, str]] = [
    # script/style subtrees vanish wholesale (lazy match to the FIRST
    # closer — embedded "</script>" in string literals is out of spec)
    (r"(?is)<script\b[^>]*>.*?</script[^>]*>", ""),
    (r"(?is)<style\b[^>]*>.*?</style[^>]*>", ""),
    (r"(?s)<!--.*?-->", ""),
    # block boundaries (open or close) and <br> become newlines,
    # table-cell closers become spaces, every other tag just vanishes
    (rf"(?i)<(?:br|/?(?:{_BLOCK_TAGS}))\b[^>]*>", _NL),
    (r"(?i)</t[dh]\b[^>]*>", " "),
    (r"<[^>]*>", ""),
    # the named/numeric entities the spec covers; &amp; LAST so
    # double-escaped forms ("&amp;lt;") unescape exactly one level
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&amp;", "&"),
    # whitespace normalization: horizontal runs -> one space, spaces
    # hugging a newline dropped, >2 blank lines -> one blank line,
    # then trim both ends
    (r"[ \t\r\f]+", " "),
    (r" *\n *", _NL),
    (r"\n{3,}", _NL + _NL),
    (r"^[ \n]+|[ \n]+$", ""),
]


def html_to_text(html: Column) -> Column:
    """Plain text rendered from raw page ``html`` (binary, UTF-8) by the
    :data:`HTML_TEXT_STEPS` chain — pure JVM ``regexp_replace`` algebra,
    no UDF, no shuffle; at 100 TB this runs inside the scan stage's
    whole-stage codegen. Spec bounds (documented, shared by all three
    engine mirrors): quoted well-formed HTML; a bare ``<`` in text must
    be written ``&lt;``; script/style content may not embed its own
    closer inside a string literal."""
    c = html.cast("string")
    for pat, rep in HTML_TEXT_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def extract_page_text(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``(url, page_text)`` for every page — the ingest stage that
    derives the pages table's ``text`` column from ``html``. Row-local;
    the per-url byte-identity contract vs an independent DOM-based
    rendering is pinned by tests/test_html_text.py and the
    ``html_page_text`` driver oracle (which reads the fixture's
    ground-truth text column rather than re-running this spec)."""
    return pages.select(
        F.col(url_col).alias("url"),
        html_to_text(F.col(html_col)).alias("page_text"),
    )
