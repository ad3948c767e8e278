"""Generate fixtures/pages_html.parquet — a deterministic input_hint-shaped
pages table (url, warc_ts, html, text, lang) whose ``text`` column is the
GROUND-TRUTH plain-text rendering of ``html``, produced by an independent
DOM-based renderer (html.parser event stream), NOT by the engine's regex
spec. The ``html_page_text`` driver oracle reads this column directly, so
the engine's ``html_to_text`` chain is hash-verified byte-for-byte against
a genuinely independent implementation of the same rendering spec.

The pages exercise: script blocks with markup inside string literals
(kept out-of-spec constructs excluded — see html_to_text docstring),
style blocks with ``>`` combinators, multi-line comments containing tags,
uppercase/mixed-case tags, ``<br>``/``<br/>``/``<BR />`` variants, nested
inline markup, tables (cell closers -> spaces, row closers -> newlines),
headings/lists/blockquotes, all seven spec entities incl. the
double-escaped ``&amp;lt;`` one-level case, attributes spanning newlines,
multi-byte UTF-8 text, and messy source whitespace.

Usage: python tools/make_html_fixture.py   (writes fixtures/pages_html.parquet)
"""

from __future__ import annotations

import datetime as dt
import os
import re
import sys
from html.parser import HTMLParser

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = 60
BASE_TS = dt.datetime(2024, 5, 1)

_BLOCK = {
    "p", "div", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6", "ul",
    "ol", "table", "blockquote", "section", "article", "header",
    "footer", "title", "pre",
}


class _DomText(HTMLParser):
    """Event-stream renderer of the html_to_text spec: block tag edges
    (open AND close) emit newline, <br> emits newline, </td>//<th>
    closers emit a space, script/style/comment content is dropped,
    charrefs decode via html.parser's own table (convert_charrefs)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1
        elif tag in _BLOCK or tag == "br":
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK:
            self.parts.append("\n")
        elif tag in ("td", "th"):
            self.parts.append(" ")

    def handle_startendtag(self, tag, attrs):
        if tag == "br" or tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._skip:
            self.parts.append(data)


def dom_render(html: str) -> str:
    """Ground-truth rendering: DOM event pass + the spec's whitespace
    normalization (nbsp -> space BEFORE collapsing, matching the regex
    chain's &nbsp; -> ' ' step; the fixture never contains a raw
    U+00A0, so the translation is exactly the entity's)."""
    p = _DomText()
    p.feed(html)
    p.close()
    t = "".join(p.parts).replace("\xa0", " ")
    t = re.sub(r"[ \t\r\f]+", " ", t)
    t = re.sub(r" *\n *", "\n", t)
    t = re.sub(r"\n{3,}", "\n\n", t)
    return re.sub(r"^[ \n]+|[ \n]+$", "", t)


def page_html(i: int) -> str:
    """Deterministic messy page i."""
    inline = [
        f"The <b>quick</b> brown <i>fox {i}</i> jumps",
        f"café naïveté — résumé {i}",
        f'she said &quot;hello {i}&quot; &amp; waved',
        f"tokens &lt;s&gt; and &lt;/s&gt; are special, x {i}",
        f"it&#39;s page {i}, isn&apos;t it",
        f"escaped literal: &amp;lt;still-an-entity&amp;gt; {i}",
        f"A&nbsp;B&nbsp;&nbsp;C {i}",
    ]
    br = ["<br>", "<br/>", "<BR />", "<br >"][i % 4]
    rows = "".join(
        f"<tr><td>r{i}c{j}</td><TD>v{j}</TD><th>h{j}</th></tr>"
        for j in range(2)
    )
    items = "".join(f"<li>item {i}.{j}</li>" for j in range(3))
    chunks = [
        f"<!DOCTYPE html><html><head><title>Page {i} &amp; friends</title>",
        f'<meta charset="utf-8"><link rel="x" href="/s{i}.css">',
        f"<style type='text/css'>p > a {{ color: red; }}\n"
        f".c{i} {{ margin: 0 }}</style>",
        f"<script>\nvar n = {i};\nif (n < 9 && n > 1) "
        f"{{ document.write('hi ' + n); }}\n</script></head>",
        f'<BODY class="page c{i}">',
        f"<!-- nav {i}\n  <p>commented out</p>\n-->",
        f"<H1>Heading {i}</H1>",
        f"<p>{inline[i % len(inline)]} first.{br}"
        f"{inline[(i + 1) % len(inline)]} second.</p>",
        f'<div id="d{i}"\n   data-x="y">{inline[(i + 2) % len(inline)]}'
        f" in a div.</div>",
        f"<ul>{items}</ul>",
        f"<table>{rows}</table>",
        f"<blockquote>quote {i}: <em>nested <b>deep</b></em>"
        f" tail.</blockquote>",
        f"<SCRIPT type='text/javascript'>var s = 'page {i}';</SCRIPT>",
        f"<p>tail über paragraph {i}</p>",
        "</body></html>",
    ]
    # vary ordering/presence a little so pages differ structurally
    if i % 3 == 0:
        chunks.insert(7, f"<section><header>hdr {i}</header>"
                         f"<article>art {i}</article></section>")
    if i % 5 == 0:
        chunks.insert(8, f"<pre>  raw   spacing {i}\n"
                         f"kept? no: normalized</pre>")
    return "".join(chunks)


def rows():
    out = []
    for i in range(N_PAGES):
        html = page_html(i)
        out.append(
            {
                "url": f"https://html{i % 9}.example.org/p/{i}",
                "warc_ts": BASE_TS + dt.timedelta(hours=i),
                "html": html.encode("utf-8"),
                "text": dom_render(html),
                "lang": "en",
            }
        )
    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, "fixtures", "pages_html.parquet")
    df = pd.DataFrame(rows())
    df["warc_ts"] = pd.to_datetime(df["warc_ts"]).astype("datetime64[us]")
    df.to_parquet(dest, index=False)
    print(f"wrote {dest}: {len(df)} pages, "
          f"{int(df['text'].str.len().sum())} text chars")


if __name__ == "__main__":
    main()
