"""Generate fixtures/pages_links.parquet — a deterministic input_hint-shaped
pages table (url, warc_ts, html, text, lang) whose html carries ``<a>``
anchors in every form the outlink spec covers: absolute http/https (messy —
case, www., default ports, tracking params, fragments), protocol-relative,
root-relative, path-relative (incl. './', '../' and leading-space hrefs),
single- and double-quoted, mixed-case HREF attributes, newlines inside the
tag — plus non-link hrefs that must be skipped (mailto:, javascript:,
tel:, data:, ftp:, '#frag', empty) and href-bearing non-anchor tags
(<link>, <img>) that must not be extracted.

Used by the ``html_outlinks`` / ``web_link_hostgraph`` queries, whose
DuckDB oracles independently re-derive extraction + resolution +
canonicalization from this parquet (no golden of the engine's own output).

Usage: python tools/make_links_fixture.py   (writes fixtures/pages_links.parquet)
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepex_spark.sources.pages import synth_doc_for  # noqa: E402

N_PAGES = 160
SEED = 20260818
BASE_TS = dt.datetime(2024, 4, 1)


def src_url(i: int, rng: random.Random) -> str:
    """Messy source url for page i — exercises that resolution keys off
    the CANONICAL src (scheme/host case, www., default port, trailing
    slash, tracking params all normalized before deriving origin/dir)."""
    scheme = ["https", "http", "HTTPS", "Http"][i % 4]
    www = "www." if i % 3 == 0 else ""
    host = f"site{i % 7}.example.org"
    port = {0: ":443", 1: ":80"}.get(i % 9, "")
    if port == ":443" and scheme.lower() != "https":
        port = ""
    if port == ":80" and scheme.lower() != "http":
        port = ""
    if i % 13 == 0:
        return f"{scheme}://{host}"  # bare origin: srcdir must become '/'
    path = f"/articles/{i}" + ("/" if i % 5 == 0 else "")
    q = {0: "?q=spark&utm_source=feed", 1: "?b=2&a=1", 2: "?gclid=x"}.get(i % 6, "")
    frag = "#sec" if i % 8 == 0 else ""
    return f"{scheme}://{www}{host}{port}{path}{q}{frag}"


def canon_of(j: int) -> str:
    """CANONICAL url of page j (mirrors src_url under the
    normalize_url spec) — used to emit in-corpus links, so the crawl
    frontier anti-join has real hits to exclude."""
    scheme = ["https", "http", "https", "http"][j % 4]
    if j % 13 == 0:
        return f"{scheme}://site{j % 7}.example.org"
    q = {0: "?q=spark", 1: "?a=1&b=2", 2: ""}.get(j % 6, "")
    return f"{scheme}://site{j % 7}.example.org/articles/{j}{q}"


ENTITIES = [
    "Apache Spark", "Alan Turing", "Grace Hopper", "New York City",
    "Tim Berners-Lee", "World Wide Web", "Ada Lovelace",
]


def entity_name(j: int) -> str:
    """Canonical entity name of target page j (unique per page)."""
    return f"{ENTITIES[j % len(ENTITIES)]} {j // len(ENTITIES)}"


def anchor_text(j: int, v: int) -> str:
    """Messy surface variant v of target j's entity name — every variant
    must collapse to lower(entity_name(j)) under the alias-normalization
    spec (ASCII-whitespace runs -> ' ', trim, lower)."""
    name = entity_name(j)
    return {
        0: name,
        1: name.upper(),
        2: f"  {name.lower()} ",
        3: name.replace(" ", "\n"),
        4: f"{name}\t",
        5: name.replace(" ", " \t "),
    }[v % 6]


def anchors_for(i: int, rng: random.Random) -> list[str]:
    """Deterministic anchor-tag menu for page i. Every page draws 3-8;
    pages with i % 17 == 0 get none (zero-outlink pages must survive).
    Pages with i % 2 == 0 additionally link to 1-2 OTHER pages of the
    corpus (canonical form), so the link graph has real in-corpus
    structure and the frontier query has crawled targets to exclude."""
    if i % 17 == 0:
        return []
    internal = []
    if i % 2 == 0:
        # Same-host targets (i+7k ≡ i mod 7): in-corpus links the frontier
        # anti-join must exclude, WITHOUT adding inter-host edges that
        # would flatten the host PageRank graph to a complete digraph.
        # Anchor texts are messy surface variants of the TARGET's entity
        # name (alias mining must collapse them); pages with i % 10 == 0
        # mislabel the link with a DIFFERENT entity's name — deterministic
        # anchor-text noise, so some aliases map to >1 target and the
        # dictionary's argmax/confidence path is exercised.
        j1 = (i + 7) % N_PAGES
        t1 = anchor_text(j1 if i % 10 else (j1 + 7) % N_PAGES, i // 2)
        internal.append(f'<a href="{canon_of(j1)}">{t1}</a>')
        if i % 4 == 0:
            j2 = (i + 21) % N_PAGES
            internal.append(
                f'<a href="{canon_of(j2)}">{anchor_text(j2, i // 4)}</a>'
            )
    k, m = (i * 3 + 1) % 7, i % 23
    menu = [
        f'<a href="https://site{k}.example.org/ref/{m}?utm_source=x&z=1#top">r</a>',
        f'<a class="x" HREF = "HTTP://WWW.site{k}.example.org:80/ref/{m}/">r</a>',
        f'<a href="//site{(k + 1) % 7}.example.org/pp/{m}">p</a>',
        f'<a href="/local/{m}?b=2&a=1">l</a>',
        f"<a href='rel/{m}.html'>q</a>",
        f'<a href="./here{m}.html">d</a>',
        f'<a href="../up{m}.html">u</a>',
        f'<a href=" spaced{m}.html ">s</a>',
        f'<a\n  title="t"\n  href="/nl/{m}">n</a>',
        '<a href="mailto:a@b.example">skip</a>',
        '<a href="javascript:void(0)">skip</a>',
        '<a href="tel:+1-555-0100">skip</a>',
        '<a href="data:text/plain,hi">skip</a>',
        f'<a href="ftp://site{k}.example.org/f">skip</a>',
        '<a href="#frag">skip</a>',
        '<a href="">skip</a>',
        f'<link rel="stylesheet" href="/not-a-link/{m}.css">',
        f'<img src="/i.png" href="/not-an-anchor/{m}">',
    ]
    n = 3 + rng.randrange(6)
    picks = internal + [menu[rng.randrange(len(menu))] for _ in range(n)]
    if i % 4 == 0:  # a repeated anchor: must collapse to one edge
        picks.append(picks[-1])
    return picks


def text_for(i: int, body: str) -> str:
    """Page text = host-template boilerplate around the unique body: a
    nav header and copyright footer on EVERY page of the host (frac 1.0
    -> boilerplate), a newsletter line on ~1/3 of pages (below the 0.5
    frac threshold -> content, stays), the synth body unique per page."""
    k = i % 7
    parts = [f"Home | About | Contact — site{k}", body]
    if i % 3 == 0:
        parts.append("Subscribe to our newsletter")
    parts.append(f"© 2024 site{k}.example.org. All rights reserved.")
    return "\n".join(parts)


def rows():
    out = []
    for i in range(N_PAGES):
        rng = random.Random(SEED * 7_368_787 + i)
        text = text_for(i, synth_doc_for(i, seed=SEED + 1))
        body = f"<p>{text}</p>\n" + "\n".join(anchors_for(i, rng))
        html = f"<html><body>{body}</body></html>".encode("utf-8")
        out.append(
            {
                "url": src_url(i, rng),
                "warc_ts": BASE_TS + dt.timedelta(hours=i),
                "html": html,
                "text": text,
                "lang": "en",
            }
        )
    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, "fixtures", "pages_links.parquet")
    df = pd.DataFrame(rows())
    df["warc_ts"] = pd.to_datetime(df["warc_ts"]).astype("datetime64[us]")
    df.to_parquet(dest, index=False)
    n_anchors = sum(h.count(b"<a ") + h.count(b"<a\n") for h in df["html"])
    print(f"wrote {dest}: {len(df)} pages, ~{n_anchors} anchor tags")


if __name__ == "__main__":
    main()
