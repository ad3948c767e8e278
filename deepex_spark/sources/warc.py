"""WARC (ISO 28500 / Common Crawl) ingest -> the input_hint pages table.

The north-star corpus is "Common-Crawl-style web pages"; Common Crawl
publishes them as WARC 1.0 files — a sequence of records, each::

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: http://example.com/page\\r\\n
    WARC-Date: 2024-05-01T12:00:00Z\\r\\n
    Content-Length: N\\r\\n            (byte length of the block below)
    \\r\\n
    <N bytes: HTTP response = status line + headers + \\r\\n\\r\\n + payload>
    \\r\\n\\r\\n

and ``.warc.gz`` files are CONCATENATED PER-RECORD GZIP MEMBERS (each
record its own gzip stream), so a reader can seek to a member boundary
and inflate one record — the property Common Crawl's CDX indexes rely on.

Two readers, one exact and one JVM-only, same output schema:

* :func:`read_warc` — the production path. ``binaryFile`` scan (one row
  per WARC file) -> Arrow ``mapInPandas`` parser that walks records by
  ``Content-Length`` EXACTLY (payload bytes are never pattern-matched, so
  a body containing the literal record separator cannot mis-split) and
  inflates gzip members one at a time with ``zlib.decompressobj`` (never
  the whole file at once: peak memory is one member + its inflate, not
  the decompressed file). Parallelism is per FILE — exactly the real
  cluster shape: ``.warc.gz`` is not block-splittable, and a Common Crawl
  segment is ~64k files x ~1 GiB, thousands of independent tasks. Each
  row carries (warc_file, warc_offset, warc_len) lineage — for gzip input
  these are COMPRESSED member offsets, so any record can be re-fetched
  later with a ranged read + one-member inflate, the same audit handle
  CC's own index publishes.
* :func:`read_warc_text` — uncompressed WARC only, zero Python: a
  ``text`` scan with ``lineSep = b"\\r\\n\\r\\nWARC/1.0\\r\\n"`` splits
  records INSIDE the JVM (block-splittable — Hadoop's LineRecordReader
  resyncs on the delimiter past each split start, so one huge .warc fans
  out across tasks), then pure ``regexp_extract``/``substring`` column
  algebra parses headers. Caveats are structural and flagged, not silent:
  a payload containing the 12-byte separator mis-splits (every row
  validates parsed ``Content-Length`` against the actual block length
  into ``valid``), and the UTF-8 decode is lossy for non-UTF-8 payload
  bytes. Use it for text-clean corpora where the zero-Python scan
  matters; ``read_warc`` is the correctness reference.

Only ``WARC-Type: response`` records become pages (request / metadata /
warcinfo / revisit records are dropped, like every CC extraction job).
The HTTP block is split at the first ``\\r\\n\\r\\n``: status + mime from
the head, payload -> ``html``. Transfer-/Content-Encoding of the HTTP
payload is NOT decoded (Common Crawl stores identity bodies; an encoded
body passes through as stored, mime says what it is).

:func:`warc_to_pages` finishes the job: project to the exact input_hint
shape ``(url, warc_ts, html, text, lang)`` with ``text`` rendered by the
engine's :func:`~deepex_spark.operators.urls.html_to_text` chain and
``lang`` by the same stopword-signal heuristic as ``lang_id_heuristic``
— all row-local column algebra on top of the scan.

Verification: ``tools/make_warc_fixture.py`` serializes GROUND-TRUTH
records (known url/ts/status/payload tuples, including a payload that
embeds the record separator and multi-byte UTF-8) into committed
``.warc`` + ``.warc.gz`` fixtures AND writes the truth rows to
``fixtures/warc_expected.parquet`` — the writer never runs any parser,
so the registered ``warc_ingest`` oracle hash-checks the engine's parse
against independently-known bytes. tests/test_warc.py pins both readers
against the truth, the separator-embedded payload, member-offset
re-fetch, and gzip==plain parity.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_SEP = b"\r\n\r\nWARC/1.0\r\n"
_HDR_END = b"\r\n\r\n"

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("warc_file", T.StringType()),
        T.StructField("warc_offset", T.LongType()),
        T.StructField("warc_len", T.LongType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


# ---------------------------------------------------------------------------
# record-level parsing (shared by the exact reader and the fixture tests)
# ---------------------------------------------------------------------------

def _parse_headers(raw: bytes) -> dict:
    """WARC named fields: ``Name: value`` lines after the version line.
    Names are case-insensitive (spec §4); lowered here."""
    out = {}
    for line in raw.split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            out[k.strip().lower().decode("ascii", "replace")] = v.strip().decode(
                "utf-8", "replace"
            )
    return out


def _split_http(block: bytes) -> Tuple[int, str, bytes]:
    """HTTP response block -> (status, mime, payload). A block that does
    not start with an HTTP status line yields (0, '', block)."""
    head, sep, payload = block.partition(_HDR_END)
    if not head.startswith(b"HTTP/"):
        return 0, "", block
    status = 0
    first = head.split(b"\r\n", 1)[0].split(b" ")
    if len(first) >= 2 and first[1].isdigit():
        status = int(first[1])
    mime = ""
    for line in head.split(b"\r\n")[1:]:
        k, s, v = line.partition(b":")
        if s and k.strip().lower() == b"content-type":
            mime = v.strip().decode("utf-8", "replace").split(";")[0].strip()
            break
    return status, mime, payload if sep else b""


def parse_warc_member(member: bytes):
    """One decompressed record (version line .. block, trailing CRLFs
    optional) -> header dict + block bytes, or None if malformed."""
    if not member.startswith(b"WARC/"):
        return None
    head, sep, rest = member.partition(_HDR_END)
    if not sep:
        return None
    headers = _parse_headers(head)
    try:
        clen = int(headers.get("content-length", ""))
    except ValueError:
        return None
    if len(rest) < clen:
        return None
    return headers, rest[:clen]


def iter_warc_records(
    data: bytes, gz: bool
) -> Iterator[Tuple[int, int, dict, bytes]]:
    """Yield (offset, length, headers, block) for each record in one WARC
    file's bytes. For gz input, offset/length address the COMPRESSED
    member (ranged-read re-fetchable); for plain input, the record bytes.

    Gzip members are inflated ONE AT A TIME via ``decompressobj`` —
    ``unused_data`` marks the member boundary, giving exact compressed
    offsets without decompressing the file into one buffer.
    """
    if gz:
        pos = 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            member = d.decompress(data[pos:])
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:  # trailing garbage; stop rather than spin
                return
            parsed = parse_warc_member(member)
            if parsed is not None:
                yield pos, consumed, parsed[0], parsed[1]
            pos += consumed
        return
    pos = 0
    n = len(data)
    while pos < n:
        if not data[pos:].startswith(b"WARC/"):
            # skip leading/stray CRLFs between records
            nxt = data.find(b"WARC/", pos)
            if nxt < 0:
                return
            pos = nxt
        head_end = data.find(_HDR_END, pos)
        if head_end < 0:
            return
        headers = _parse_headers(data[pos:head_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        block_start = head_end + len(_HDR_END)
        end = block_start + clen
        if end > n:
            return
        yield pos, end - pos, headers, data[block_start:end]
        pos = end + 4 if data[end : end + 4] == b"\r\n\r\n" else end


def _records_to_rows(path: str, data: bytes, gz: bool) -> Iterable[tuple]:
    for off, length, headers, block in iter_warc_records(data, gz):
        if headers.get("warc-type") != "response":
            continue
        status, mime, payload = _split_http(block)
        ts = pd.to_datetime(
            headers.get("warc-date"), utc=True, errors="coerce", format="ISO8601"
        )
        yield (
            headers.get("warc-target-uri", ""),
            None if ts is pd.NaT else ts.tz_localize(None),
            payload,
            status,
            mime,
            path,
            off,
            length,
            True,
        )


# ---------------------------------------------------------------------------
# reader 1: exact, binaryFile + mapInPandas (production path)
# ---------------------------------------------------------------------------

def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Exact WARC reader. One task per file (``binaryFile`` rows are
    whole files — the unit ``.warc.gz`` forces anyway); records walked by
    Content-Length, gzip members inflated one at a time. Output schema
    :data:`WARC_SCHEMA`; only response records; ``valid`` always true on
    this path (malformed records are skipped, not emitted)."""

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = list(
                    _records_to_rows(
                        row["path"],
                        bytes(row["content"]),
                        gz=row["path"].endswith(".gz"),
                    )
                )
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.warc*"
    ).load(path)
    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


# ---------------------------------------------------------------------------
# reader 2: JVM-only lineSep split (uncompressed, text-clean corpora)
# ---------------------------------------------------------------------------

def _hdr(rec: Column, name: str) -> Column:
    # (?i) — WARC named fields are case-insensitive; (?m) anchors per line
    return F.regexp_extract(rec, r"(?im)^" + name + r":[ \t]*([^\r\n]*)", 1)


def read_warc_text(spark: SparkSession, path: str) -> DataFrame:
    """JVM-side WARC reader for UTF-8-clean WARC: a text scan
    record-split on ``\\r\\n\\r\\nWARC/1.0\\r\\n`` (for plain ``.warc``
    this is block-splittable — the Hadoop line reader resyncs on the
    delimiter past each split start, so ONE large file fans out across
    tasks; ``.gz`` input also works via the transparent Hadoop codec but
    is one split per file), then pure ``regexp_extract`` + byte-exact
    binary ``substring`` column algebra — no Python anywhere.

    Structural caveats, flagged not silent: a payload embedding the
    12-byte separator mis-splits (its record comes up short of
    ``Content-Length`` and surfaces with ``valid = false``; the orphaned
    tail half has no WARC headers and drops with the non-response
    filter), and non-UTF-8 payload bytes are lossy through the string
    decode. ``warc_offset``/``warc_len`` are -1 — the JVM splitter does
    not expose byte positions; use :func:`read_warc` when lineage
    offsets or exactness matter.

    Header chars are ASCII and parsed on the string; block slicing uses
    ``octet_length`` + binary ``substring`` so Content-Length (BYTES)
    lands exactly even when the payload is multi-byte UTF-8.
    """
    raw = (
        spark.read.format("text")
        .option("lineSep", RECORD_SEP.decode("ascii"))
        .load(path)
        .withColumn("warc_file", F.input_file_name())
    )
    # the first record of each file keeps its "WARC/1.0\r\n" version
    # line; later records had it consumed by the separator.
    rec = F.regexp_replace(F.col("value"), r"\AWARC/1\.0\r\n", "")
    stage = raw.select(
        rec.alias("rec"),
        F.substring_index(rec, "\r\n\r\n", 1).alias("hdr_block"),
        "warc_file",
    ).select(
        "hdr_block",
        # block = bytes past the header terminator (hdr is ASCII:
        # char length == byte length, +4 for \r\n\r\n, +1 one-based)
        F.expr(
            "substring(cast(rec as binary), octet_length(hdr_block) + 5)"
        ).alias("block_bin"),
        _hdr(F.col("hdr_block"), "WARC-Type").alias("warc_type"),
        _hdr(F.col("hdr_block"), "WARC-Target-URI").alias("url"),
        _hdr(F.col("hdr_block"), "WARC-Date").alias("warc_date"),
        _hdr(F.col("hdr_block"), "Content-Length").cast("long").alias("clen"),
        "warc_file",
    ).filter(F.col("warc_type") == "response")
    # mid-file records lost their trailing \r\n\r\n to the separator
    # (block == clen bytes); the file's last record keeps it (clen + 4)
    stage = stage.select(
        "*",
        F.expr("substring(block_bin, 1, cast(clen as int))").alias("block"),
        (
            (F.expr("octet_length(block_bin)") == F.col("clen"))
            | (F.expr("octet_length(block_bin)") == F.col("clen") + 4)
        ).alias("valid"),
    )
    http_head = F.substring_index(F.col("block").cast("string"), "\r\n\r\n", 1)
    stage = stage.select(
        "*",
        http_head.alias("http_head"),
        # payload = block bytes past the ASCII HTTP head + \r\n\r\n
        F.expr(
            "substring(block, octet_length(substring_index(cast(block as string),"
            " '\r\n\r\n', 1)) + 5)"
        ).alias("payload"),
    )
    return stage.select(
        "url",
        F.to_timestamp(
            F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_ts"),
        F.col("payload").alias("html"),
        F.regexp_extract(F.col("http_head"), r"\AHTTP/\S+ (\d{3})", 1)
        .cast("int")
        .alias("http_status"),
        F.trim(
            F.substring_index(
                F.regexp_extract(
                    F.col("http_head"), r"(?im)^Content-Type:[ \t]*([^\r\n]*)", 1
                ),
                ";",
                1,
            )
        ).alias("mime"),
        "warc_file",
        F.lit(-1).cast("long").alias("warc_offset"),
        F.lit(-1).cast("long").alias("warc_len"),
        "valid",
    )


# ---------------------------------------------------------------------------
# pages projection
# ---------------------------------------------------------------------------

_STOP = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "was"]


def lang_guess(text: Column) -> Column:
    """Same stopword-share heuristic as the ``lang_id_heuristic`` query
    (>= 5% of whitespace tokens in the tiny English stopword list), as a
    row-local expression usable inside the ingest scan."""
    words = F.split(text, " ")
    hits = F.size(F.filter(words, lambda w: w.isin(_STOP)))
    return F.when(
        (F.size(words) > 0) & (hits / F.size(words) >= 0.05), "en"
    ).otherwise("other")


def cdx_index(warc: DataFrame) -> DataFrame:
    """CDX-style capture index over :func:`read_warc` rows — the lookup
    table web archives (and Common Crawl itself) publish next to WARC
    files: one row per response capture, keyed by
    (SURT of the canonical url, 14-digit timestamp), carrying the
    (file, offset, length) needed for a ranged-read re-fetch plus status
    / mime / a payload digest.

    Sorted by ``surt_key`` the index range-scans per domain; written
    partitioned/bucketed by ``surt_key`` prefix it prunes. The digest is
    ``crc32`` (not CC's sha1-b32 — same dedup role, JVM-native, and the
    goldens pin payload crc32 already). Row-local column algebra on top
    of the scan; build it in the same pass as the ingest."""
    from deepex_spark.operators.urls import normalize_url, surt

    return warc.select(
        surt(normalize_url(F.col("url"))).alias("surt_key"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts14"),
        "url",
        "http_status",
        "mime",
        F.crc32("html").alias("digest_crc32"),
        F.regexp_extract("warc_file", "([^/]+)$", 1).alias("warc_name"),
        "warc_offset",
        "warc_len",
    )


def warc_to_pages(warc: DataFrame) -> DataFrame:
    """WARC rows -> the exact input_hint shape ``(url, warc_ts, html,
    text, lang)``: keep HTTP 200 html responses, render ``text`` with the
    engine's html_to_text chain, guess ``lang`` from it. Row-local on top
    of the scan — no exchange."""
    from deepex_spark.operators.urls import html_to_text

    kept = warc.filter(
        (F.col("http_status") == 200)
        & (F.col("mime").isin("text/html", "application/xhtml+xml"))
    )
    text = html_to_text(F.col("html"))
    return kept.select(
        "url",
        "warc_ts",
        "html",
        text.alias("text"),
        lang_guess(text).alias("lang"),
    )
