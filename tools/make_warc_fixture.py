"""Generate fixtures/warc/ — deterministic WARC 1.0 files plus the
ground-truth table the ``warc_ingest`` driver oracle reads.

The writer SERIALIZES known (url, ts, status, mime, payload) tuples into
``sample0.warc`` (plain) and ``sample1.warc.gz`` (per-record gzip
members, mtime=0 so bytes are reproducible), recording each record's
byte offset/length as it writes — it never runs any parser, so
``fixtures/warc_expected.parquet`` is independent ground truth and the
driver's hash check proves the engine's reader recovers exactly the
bytes that were put in.

Deliberate record mix:
* a ``warcinfo`` record and ``request`` records interleaved with the
  responses (must be dropped);
* multi-byte UTF-8 payloads (byte-exact Content-Length slicing);
* a payload EMBEDDING the 12-byte record separator
  ``\\r\\n\\r\\nWARC/1.0\\r\\n`` (the exact reader must keep it intact;
  the JVM lineSep reader's documented mis-split is pinned in pytest,
  not here);
* a 404 response and a non-HTML 200 (kept by ``read_warc``, dropped by
  ``warc_to_pages``);
* an empty payload.

Usage: python tools/make_warc_fixture.py   (writes fixtures/warc/*,
fixtures/warc_expected.parquet)
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import os
import sys
import zlib

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
WARC_DIR = os.path.join(FIXTURE_DIR, "warc")

SEP_PAYLOAD = b"A body that embeds the separator \r\n\r\nWARC/1.0\r\n mid-stream."

# (url, iso_ts, status, mime, payload) ground truth; None mime = raw block
RESPONSES_0 = [
    ("https://site0.example.org/a", "2024-05-01T08:00:00Z", 200, "text/html",
     "<html><body><p>Plain page. The cat sat on the mat and the dog was in "
     "the yard of the house.</p></body></html>".encode()),
    ("https://site1.example.org/unicode", "2024-05-01T09:30:00Z", 200, "text/html",
     "<html><body><p>Multi-byte: café — naïve 世界 "
     "\U0001f600 and the end of a line in the text.</p></body></html>".encode("utf-8")),
    ("https://site2.example.org/not-found", "2024-05-01T10:00:00Z", 404, "text/html",
     b"<html><body>gone</body></html>"),
    ("https://site3.example.org/data.json", "2024-05-01T11:15:00Z", 200,
     "application/json", b'{"k": [1, 2, 3]}'),
    ("https://site4.example.org/empty", "2024-05-01T12:00:00Z", 200, "text/html",
     b""),
]

RESPONSES_1 = [
    ("https://site5.example.org/sep-embed", "2024-06-02T07:45:00Z", 200,
     "text/html", b"<html><body><pre>" + SEP_PAYLOAD + b"</pre></body></html>"),
    ("https://site6.example.org/b?x=1&y=2", "2024-06-02T08:05:00Z", 200,
     "text/html",
     "<html><head><title>T</title></head><body><p>Second file page with a "
     "list of words in the middle of the body and an &amp; entity.</p>"
     "</body></html>".encode()),
    ("https://site0.example.org/a", "2024-06-03T08:00:00Z", 200, "text/html",
     b"<html><body><p>Refetch of the first page, later snapshot.</p></body></html>"),
]


def http_block(status: int, mime: str, payload: bytes) -> bytes:
    reason = {200: "OK", 404: "Not Found"}.get(status, "OK")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {mime}; charset=UTF-8\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    )
    return head.encode("ascii") + payload


def warc_record(wtype: str, headers: list, block: bytes) -> bytes:
    lines = [("WARC-Type", wtype)] + headers + [
        ("Content-Length", str(len(block)))
    ]
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("ascii") for k, v in lines
    )
    return head + b"\r\n" + block + b"\r\n\r\n"


def response_record(url, ts, status, mime, payload):
    return warc_record(
        "response",
        [
            ("WARC-Target-URI", url),
            ("WARC-Date", ts),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http_block(status, mime, payload),
    )


def request_record(url, ts):
    return warc_record(
        "request",
        [("WARC-Target-URI", url), ("WARC-Date", ts),
         ("Content-Type", "application/http; msgtype=request")],
        f"GET {url} HTTP/1.1\r\nHost: x\r\n\r\n".encode("ascii"),
    )


def warcinfo_record():
    return warc_record(
        "warcinfo",
        [("WARC-Date", "2024-05-01T00:00:00Z"),
         ("Content-Type", "application/warc-fields")],
        b"software: make_warc_fixture deterministic\r\n",
    )


def gz_member(rec: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(rec)
    return buf.getvalue()


def build(responses, fname: str, gz: bool):
    """Interleave warcinfo/request records with the truth responses,
    recording each RESPONSE record's (offset, length) as written."""
    records = [(None, warcinfo_record())]
    for r in responses:
        records.append((None, request_record(r[0], r[1])))
        records.append((r, response_record(*r)))
    out, truth = [], []
    pos = 0
    for meta, rec in records:
        blob = gz_member(rec) if gz else rec
        if meta is not None:
            url, ts, status, mime, payload = meta
            truth.append(
                {
                    "url": url,
                    "warc_ts": dt.datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ"),
                    "http_status": status,
                    "mime": mime,
                    "html_len": len(payload),
                    "html_crc32": zlib.crc32(payload),
                    "warc_name": fname,
                    "warc_offset": pos,
                    "warc_len": len(blob) if gz else len(rec) - 4,
                }
            )
        pos += len(blob)
        out.append(blob)
    with open(os.path.join(WARC_DIR, fname), "wb") as f:
        f.write(b"".join(out))
    return truth


def main():
    os.makedirs(WARC_DIR, exist_ok=True)
    truth = build(RESPONSES_0, "sample0.warc", gz=False) + build(
        RESPONSES_1, "sample1.warc.gz", gz=True
    )
    df = pd.DataFrame(truth)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    dest = os.path.join(FIXTURE_DIR, "warc_expected.parquet")
    df.to_parquet(dest, index=False)
    print(f"wrote {len(truth)} truth rows -> {dest}; files in {WARC_DIR}")


if __name__ == "__main__":
    main()
