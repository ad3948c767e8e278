"""Generate fixtures/pages.parquet — a deterministic input_hint-shaped
pages table (url, warc_ts, html, text, lang) with MESSY URLs: per logical
page, 1-3 surface variants differing in scheme/host case, ``www.``,
default ports, trailing slashes, fragments, tracking params and param
order, plus families with genuinely distinct ports/params that must NOT
merge. Used by the ``url_canonicalize`` / ``crawl_keep_newest`` queries,
whose DuckDB oracles independently re-derive the normalization from this
parquet (no golden of the engine's own output).

Usage: python tools/make_pages_fixture.py   (writes fixtures/pages.parquet)
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepex_spark.sources.pages import synth_doc_for  # noqa: E402

N_PAGES = 200
SEED = 20260818
BASE_TS = dt.datetime(2024, 3, 1)


def _case(rng: random.Random, s: str) -> str:
    return rng.choice([s, s.upper(), s.capitalize()])


def variant_url(i: int, j: int, rng: random.Random) -> str:
    """Surface variant j of logical page i. Variant 0 is the plain form;
    others decorate it with canonicalization-invariant noise. Pages with
    i % 11 == 0 get a REAL :8080 port on variant 1 (a different origin —
    must stay a separate canonical url)."""
    https = i % 5 != 0
    scheme = "https" if https else "http"
    host = f"site{i % 7}.example.org"
    path = f"/articles/{i}"
    params = ["a=1", "b=2"] if i % 3 == 0 else (["q=spark"] if i % 3 == 1 else [])

    if j == 0:
        q = "?" + "&".join(params) if params else ""
        return f"{scheme}://{host}{path}{q}"

    if i % 11 == 0 and j == 1:
        # genuinely different origin: non-default port, kept by the spec
        q = "?" + "&".join(params) if params else ""
        return f"{scheme}://{host}:8080{path}{q}"

    s = _case(rng, scheme)
    h = _case(rng, host)
    if rng.random() < 0.5:
        h = _case(rng, "www.") + h
    if rng.random() < 0.4:
        h += ":443" if https else ":80"
    p = path + rng.choice(["", "/", "//"])
    qparams = list(params)
    if rng.random() < 0.6:
        qparams.append(rng.choice(["utm_source=feed", "utm_medium=rss", "gclid=xyz", "fbclid=abc"]))
    rng.shuffle(qparams)
    q = "?" + "&".join(qparams) if qparams else ""
    frag = rng.choice(["", "#sec1", "#ref"])
    return f"{s}://{h}{p}{q}{frag}"


def rows():
    out = []
    for i in range(N_PAGES):
        rng = random.Random(SEED * 1_000_003 + i)
        text = synth_doc_for(i, seed=SEED)
        html = ("<html><body>" + text + "</body></html>").encode("utf-8")
        n_var = 1 + (i % 3)
        for j in range(n_var):
            # two variants of page families i%13==0 share an EXACT
            # timestamp so the keep-newest tie-break (url asc) is exercised
            ts_off = 0 if (i % 13 == 0 and j > 0) else j
            ts = BASE_TS + dt.timedelta(hours=ts_off, seconds=i)
            out.append((variant_url(i, j, rng), ts, html, text, "en"))
    return out


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    df = pd.DataFrame(rows(), columns=["url", "warc_ts", "html", "text", "lang"])
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    path = os.path.join(repo, "fixtures", "pages.parquet")
    df.to_parquet(path, index=False)
    print(f"wrote {len(df)} rows ({df['url'].nunique()} distinct urls) -> {path}")


if __name__ == "__main__":
    main()
