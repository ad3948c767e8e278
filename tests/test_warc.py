"""WARC ingest (sources/warc.py) vs the serialized ground truth.

The committed fixtures (tools/make_warc_fixture.py) were produced by
SERIALIZING known records — the writer runs no parser — so every
assertion here checks the reader inverts the on-disk bytes exactly.
Covers: both readers on plain WARC, gzip member walking with compressed
offsets, a payload embedding the 12-byte record separator (exact reader
keeps it; JVM reader's documented mis-split is pinned), ranged-read
re-fetch via the lineage offsets, non-response filtering, malformed
member recovery, and the pages-table projection.
"""

from __future__ import annotations

import gzip
import os
import zlib

import pandas as pd
import pyspark.sql.functions as F
import pytest

from deepex_spark.sources.warc import (
    RECORD_SEP,
    iter_warc_records,
    parse_warc_member,
    read_warc,
    read_warc_text,
    warc_to_pages,
)

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
WARC_DIR = os.path.join(FIX, "warc")
EXPECTED = os.path.join(FIX, "warc_expected.parquet")

_PIN_COLS = [
    "url", "warc_ts", "http_status", "mime",
    "html_len", "html_crc32", "warc_name", "warc_offset", "warc_len",
]


def _pin(df):
    out = df.select(
        "url", "warc_ts", "http_status", "mime",
        F.octet_length("html").alias("html_len"),
        F.crc32("html").alias("html_crc32"),
        F.regexp_extract("warc_file", "([^/]+)$", 1).alias("warc_name"),
        "warc_offset", "warc_len",
    ).toPandas()
    return out.sort_values(["warc_name", "warc_offset"]).reset_index(drop=True)


def _truth():
    return (
        pd.read_parquet(EXPECTED)
        .sort_values(["warc_name", "warc_offset"])
        .reset_index(drop=True)
    )


def test_exact_reader_matches_serialized_truth(spark):
    got = _pin(read_warc(spark, WARC_DIR))
    exp = _truth()[_PIN_COLS]
    pd.testing.assert_frame_equal(
        got.astype({"html_crc32": "int64"}),
        exp.astype({"html_crc32": "int64"}),
        check_dtype=False,
    )


def test_jvm_reader_matches_exact_on_clean_plain_file(spark):
    plain = os.path.join(WARC_DIR, "sample0.warc")
    cols = ["url", "warc_ts", "http_status", "mime", "crc"]
    a = sorted(
        read_warc(spark, plain)
        .select(*cols[:-1], F.crc32("html").alias("crc"))
        .collect()
    )
    b_rows = read_warc_text(spark, plain).select(
        *cols[:-1], F.crc32("html").alias("crc"), "valid"
    ).collect()
    assert all(r["valid"] for r in b_rows)
    b = sorted(r[:-1] for r in b_rows)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_jvm_reader_flags_separator_embedded_payload(tmp_path, spark):
    """The documented JVM-path failure mode is FLAGGED, never silent: a
    payload containing the record separator splits its record early, so
    the surviving head comes up short of Content-Length -> valid=false,
    and the orphan tail half has no WARC headers -> dropped by the
    response filter."""
    import tools.make_warc_fixture as mk

    rec = mk.response_record(
        "https://x.example/sep", "2024-07-01T00:00:00Z", 200, "text/html",
        b"<html>head " + RECORD_SEP + b" tail</html>",
    )
    ok = mk.response_record(
        "https://x.example/ok", "2024-07-01T00:01:00Z", 200, "text/html",
        b"<html>fine</html>",
    )
    p = tmp_path / "sep.warc"
    p.write_bytes(rec + ok)
    rows = {r["url"]: r for r in read_warc_text(spark, str(p)).collect()}
    assert rows["https://x.example/sep"]["valid"] is False
    assert rows["https://x.example/ok"]["valid"] is True
    # the exact reader keeps the embedded separator byte-for-byte
    exact = {r["url"]: r for r in read_warc(spark, str(p)).collect()}
    assert bytes(exact["https://x.example/sep"]["html"]) == (
        b"<html>head " + RECORD_SEP + b" tail</html>"
    )


def test_gzip_offsets_support_ranged_refetch(spark):
    """(warc_offset, warc_len) of a gz record addresses one compressed
    member: a ranged read + single-member inflate recovers exactly the
    record the reader emitted — the audit handle Common Crawl's own
    indexes publish."""
    gz_path = os.path.join(WARC_DIR, "sample1.warc.gz")
    blob = open(gz_path, "rb").read()
    rows = read_warc(spark, gz_path).collect()
    assert rows
    for r in rows:
        member = blob[r["warc_offset"] : r["warc_offset"] + r["warc_len"]]
        headers, block = parse_warc_member(gzip.decompress(member))
        assert headers["warc-target-uri"] == r["url"]
        assert headers["warc-type"] == "response"
        payload = block.partition(b"\r\n\r\n")[2]
        assert zlib.crc32(payload) == zlib.crc32(bytes(r["html"]))


def test_plain_offsets_address_record_bytes():
    data = open(os.path.join(WARC_DIR, "sample0.warc"), "rb").read()
    recs = list(iter_warc_records(data, gz=False))
    assert len(recs) == 11  # warcinfo + 5 x (request, response)
    for off, length, headers, block in recs:
        sliced = parse_warc_member(data[off : off + length])
        assert sliced is not None
        assert sliced[0] == headers and sliced[1] == block


def test_non_response_records_dropped(spark):
    # fixture files contain warcinfo + one request per response
    truth = _truth()
    got = read_warc(spark, WARC_DIR).count()
    assert got == len(truth)


def test_malformed_gz_member_skipped_others_survive(tmp_path, spark):
    import tools.make_warc_fixture as mk

    good = mk.response_record(
        "https://x.example/good", "2024-07-02T00:00:00Z", 200, "text/html",
        b"<html>good</html>",
    )
    bad = b"WARC/1.0\r\nContent-Length: not-a-number\r\n\r\nxxx\r\n\r\n"
    p = tmp_path / "mixed.warc.gz"
    p.write_bytes(mk.gz_member(bad) + mk.gz_member(good))
    rows = read_warc(spark, str(p)).collect()
    assert [r["url"] for r in rows] == ["https://x.example/good"]
    # and the good record's offset still addresses its member
    assert rows[0]["warc_offset"] == len(mk.gz_member(bad))


def test_warc_to_pages_shape_and_filter(spark):
    pages = warc_to_pages(read_warc(spark, WARC_DIR))
    assert pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,"
        "text:string,lang:string>"
    )
    rows = pages.collect()
    urls = {r["url"] for r in rows}
    # 404 and non-html 200 dropped; all other responses kept
    assert "https://site2.example.org/not-found" not in urls
    assert "https://site3.example.org/data.json" not in urls
    assert len(rows) == 6
    # text is the engine's html_to_text rendering of the html column
    from deepex_spark.operators.urls import html_to_text

    redone = pages.select(
        "url", "text", html_to_text(F.col("html")).alias("re")
    ).collect()
    assert all(r["text"] == r["re"] for r in redone)
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://site1.example.org/unicode"]["lang"] == "en"
    assert "世界" in by_url["https://site1.example.org/unicode"]["text"]


def test_build_kg_from_warc_end_to_end(spark, tmp_path):
    """spark-submit entry with --input-format warc: raw .warc/.warc.gz
    files straight to edge/vertex tables — the full Common-Crawl shape of
    the north rule in one job invocation."""
    from jobs.build_kg import main

    out = tmp_path / "kg"
    main(
        [
            "--input", WARC_DIR,
            "--input-format", "warc",
            "--output", str(out),
            "--run-id", "warc1",
            "--dist-const", "2",
            "--max-kernel-tokens", "48",
        ]
    )
    assert (out / "edges").exists() and (out / "vertices").exists()
    from deepex_spark.plans.catalog import Catalog

    edges = Catalog(str(out)).read(spark, "edges")
    assert edges.count() > 0
    # docids are the warc target URIs
    docs = {r["sample_docid"] for r in edges.select("sample_docid").collect()}
    assert docs <= set(_truth()["url"])


def _surt_py(canon_url: str) -> str:
    """Independent pure-Python mirror of the SURT spec in
    operators/urls.py::surt (applies to CANONICAL urls)."""
    import re as _re

    m = _re.match(r"^[a-z0-9+.\-]+://(?:[^/?]*@)?([^/?@]*)", canon_url)
    authority = m.group(1)
    pm = _re.search(r":([0-9]+)$", authority)
    host = _re.sub(r":[0-9]+$", "", authority)
    rest = _re.sub(r"^[a-z0-9+.\-]+://[^/?]*", "", canon_url)
    return (
        ",".join(reversed(host.split(".")))
        + (f":{pm.group(1)}" if pm else "")
        + ")"
        + (rest or "/")
    )


def test_surt_matches_python_mirror(spark):
    from deepex_spark.operators.urls import normalize_url, surt

    raw = [
        "https://news.example.org/a/b?x=1",
        "HTTP://WWW.Example.COM:80/path/",
        "https://example.com:8443/q?b=2&a=1",
        "http://user:pw@host.example.net/secret#frag",
        "https://single/",
        "http://example.org",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    rows = df.select(
        "url",
        normalize_url(F.col("url")).alias("canon"),
        surt(normalize_url(F.col("url"))).alias("surt"),
    ).collect()
    for r in rows:
        assert r["surt"] == _surt_py(r["canon"]), (r["url"], r["canon"])
    # the point of SURT: one domain's subdomains share a key prefix
    by_url = {r["url"]: r["surt"] for r in rows}
    assert by_url["https://news.example.org/a/b?x=1"].startswith("org,example,")
    assert by_url["http://example.org"].startswith("org,example)")


def test_cdx_index_supports_ranged_refetch(spark):
    """A CDX row is a self-contained re-fetch handle: slice the named
    file at (offset, len), inflate if gz, and the record's payload crc32
    equals the row's digest."""
    import gzip as _gz

    from deepex_spark.sources.warc import cdx_index, parse_warc_member, read_warc

    rows = cdx_index(read_warc(spark, WARC_DIR)).collect()
    assert len(rows) == len(_truth())
    for r in rows:
        blob = open(os.path.join(WARC_DIR, r["warc_name"]), "rb").read()
        member = blob[r["warc_offset"] : r["warc_offset"] + r["warc_len"]]
        if r["warc_name"].endswith(".gz"):
            member = _gz.decompress(member)
        _, block = parse_warc_member(member)
        payload = block.partition(b"\r\n\r\n")[2]
        assert zlib.crc32(payload) == r["digest_crc32"]
        assert len(r["ts14"]) == 14 and r["ts14"].isdigit()
