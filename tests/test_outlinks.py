"""Outlink extraction/resolution — three independent implementations
(Spark column algebra, DuckDB oracle SQL, pure Python here) must agree on
the committed anchor fixture; the resolution spec is additionally
cross-checked against urllib.parse.urljoin on the dot-segment-free
population (the documented deviation: dot segments are NOT normalized)."""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pytest
from pyspark.sql import functions as F

from deepex_spark.operators.urls import (
    HREF_DQ_RE,
    HREF_SQ_RE,
    extract_hrefs,
    extract_outlinks,
    host_link_graph,
    resolve_href,
)
from tests.test_urls import _py_canon

FIXTURE = "fixtures/pages_links.parquet"


def _py_hrefs(html: bytes) -> list[str]:
    h = html.decode("utf-8")
    return re.findall(HREF_DQ_RE, h) + re.findall(HREF_SQ_RE, h)


def _py_resolve(src_canon: str, href: str) -> str | None:
    """Pure-Python mirror of resolve_href's documented spec."""
    t = href.strip(" ")
    if t == "" or t.startswith("#"):
        return None
    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", t):
        return t if re.match(r"(?i)^https?:", t) else None
    scheme = re.match(r"^([a-z][a-z0-9+.\-]*):", src_canon).group(1)
    m = re.match(r"^[a-z][a-z0-9+.\-]*://[^/?]*", src_canon)
    origin = m.group(0)
    rest = src_canon[len(origin):]
    path0 = rest.partition("?")[0]
    if t.startswith("//"):
        return scheme + ":" + t
    if t.startswith("/"):
        return origin + t
    srcdir = "/" if path0 == "" else re.sub(r"[^/]*$", "", path0)
    return origin + srcdir + t


def _py_edges(rows) -> set[tuple[str, str]]:
    out = set()
    for url, html in rows:
        src = _py_canon(url)
        for href in _py_hrefs(html):
            dst_abs = _py_resolve(src, href)
            if dst_abs is not None:
                out.add((src, _py_canon(dst_abs)))
    return out


class TestOutlinksThreeWay:
    def test_spark_matches_python_reference_on_fixture(self, spark):
        pages = spark.read.parquet(FIXTURE)
        got = {
            (r["src_canon"], r["dst_canon"])
            for r in extract_outlinks(pages).collect()
        }
        want = _py_edges(
            [(r["url"], bytes(r["html"])) for r in pages.collect()]
        )
        assert got == want
        assert len(got) > 100  # the fixture is not degenerate

    def test_duckdb_oracle_matches_python_reference_on_fixture(self):
        import duckdb

        from deepex_spark.queries import _outlinks_cte

        con = duckdb.connect()
        got = set(
            con.execute(
                _outlinks_cte() + "SELECT src_canon, dst_canon FROM edges"
            ).fetchall()
        )
        rows = con.execute(
            f"SELECT url, html FROM read_parquet('{FIXTURE}')"
        ).fetchall()
        assert got == _py_edges([(u, bytes(h)) for u, h in rows])

    def test_urljoin_cross_check_on_dot_free_relatives(self):
        """On hrefs without dot segments (and with a non-empty src path)
        the spec's origin+dir join must agree with RFC 3986 urljoin."""
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT url, html FROM read_parquet('{FIXTURE}')"
        ).fetchall()
        checked = 0
        for url, html in rows:
            src = _py_canon(url)
            for href in _py_hrefs(bytes(html)):
                t = href.strip(" ")
                if (
                    t == ""
                    or re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", t)
                    or t.startswith(("#", "/"))
                    or "./" in t
                ):
                    continue
                assert _py_resolve(src, t) == urljoin(src, t), (src, t)
                checked += 1
        assert checked > 50


class TestResolveHrefUnits:
    def _resolve(self, spark, src: str, href: str):
        df = spark.createDataFrame([(src, href)], "s string, h string")
        return df.select(
            resolve_href(F.col("s"), F.col("h")).alias("r")
        ).first()["r"]

    @pytest.mark.parametrize(
        "href,want",
        [
            ("https://x.org/a?b=1", "https://x.org/a?b=1"),
            ("HTTPS://x.org/a", "HTTPS://x.org/a"),  # canon lowers later
            ("//cdn.x.org/a", "http://cdn.x.org/a"),
            ("/root.html", "http://h.org/root.html"),
            ("rel.html", "http://h.org/d/rel.html"),
            (" rel.html ", "http://h.org/d/rel.html"),
            ("../up.html", "http://h.org/d/../up.html"),  # spec: verbatim
            ("mailto:a@b.c", None),
            ("javascript:void(0)", None),
            ("tel:+15550100", None),
            ("data:text/plain,hi", None),
            ("ftp://h.org/f", None),
            ("#frag", None),
            ("", None),
        ],
    )
    def test_dispatch(self, spark, href, want):
        assert self._resolve(spark, "http://h.org/d/page?q=1", href) == want

    def test_bare_origin_src_gets_root_dir(self, spark):
        assert (
            self._resolve(spark, "https://h.org", "a.html")
            == "https://h.org/a.html"
        )

    def test_query_stripped_from_src_dir(self, spark):
        # the '?q=x/y' query must not leak a phantom '/' into the dir
        assert (
            self._resolve(spark, "http://h.org/d/p?q=x/y", "r.html")
            == "http://h.org/d/r.html"
        )


class TestExtractHrefs:
    def _hrefs(self, spark, html: str) -> list[str]:
        df = spark.createDataFrame(
            [(bytearray(html.encode("utf-8")),)], "html binary"
        )
        return df.select(
            extract_hrefs(F.col("html")).alias("a")
        ).first()["a"]

    def test_anchor_only_quoted_both_kinds_and_case(self, spark):
        html = (
            '<a href="x1">.</a> <A HREF = \'x2\'>.</A>'
            '\n<a\n class="c"\n href="x3">.</a>'
            ' <link href="no.css"> <img href="no.png">'
            " <a href=unquoted>.</a>"
        )
        assert sorted(self._hrefs(spark, html)) == ["x1", "x2", "x3"]

    def test_host_link_graph_counts(self, spark):
        pages = spark.read.parquet(FIXTURE)
        edges = extract_outlinks(pages)
        hg = {
            (r["src_host"], r["dst_host"]): (r["n_edges"], r["n_dst_pages"])
            for r in host_link_graph(edges).collect()
        }
        # groupBy over a distinct edge set: n_edges == distinct dst per
        # (src,dst) host pair summed over src pages >= n_dst_pages
        assert all(ne >= nd >= 1 for ne, nd in hg.values())
        assert sum(ne for ne, _ in hg.values()) == edges.count()


def test_web_host_pagerank_mass_conserved(spark):
    """Host PageRank: N-scaled ranks average exactly 1.0 (mass
    conservation incl. dangling redistribution), hosts with inlinks from
    many others outrank leaf hosts."""
    from deepex_spark.queries import REGISTRY

    rows = REGISTRY["web_host_pagerank"].spark_fn(spark, "unused").collect()
    assert rows
    mean = sum(r["pagerank"] for r in rows) / len(rows)
    assert abs(mean - 1.0) < 1e-6
    assert max(r["pagerank"] for r in rows) > 1.0 > min(r["pagerank"] for r in rows)


def test_crawl_frontier_excludes_crawled_and_rolls_up(spark):
    """Frontier = edge targets minus crawled canon urls; counts must tie
    out against an independent recomputation from the raw edge set."""
    from deepex_spark.operators.urls import canonicalize_urls, crawl_frontier

    pages = spark.read.parquet(FIXTURE)
    edges = extract_outlinks(pages).collect()
    crawled = {
        r["canon_url"] for r in canonicalize_urls(pages).select("canon_url").collect()
    }
    frontier = {
        r["dst_canon"]: (r["n_inlinks"], r["n_src_hosts"])
        for r in crawl_frontier(pages).collect()
    }
    # the fixture's in-corpus links guarantee BOTH sides are non-trivial
    assert frontier and any(e["dst_canon"] in crawled for e in edges)
    assert not crawled & frontier.keys()
    # independent rollup over the uncrawled edge targets
    expect: dict = {}
    for e in edges:
        if e["dst_canon"] in crawled:
            continue
        n, hosts = expect.setdefault(e["dst_canon"], [0, set()])
        expect[e["dst_canon"]][0] += 1
        hosts.add(e["src_host"])
    assert frontier == {k: (n, len(h)) for k, (n, h) in expect.items()}


# ---------------------------------------------------------------------------
# anchor-text alias mining
# ---------------------------------------------------------------------------

_PAIR_DQ = re.compile(r'(?i)<a[\s][^>]*?href\s*=\s*"([^"]*)"[^>]*>([^<]*)')
_PAIR_SQ = re.compile(r"(?i)<a[\s][^>]*?href\s*=\s*'([^']*)'[^>]*>([^<]*)")


def _py_alias(txt: str) -> str:
    return re.sub("[ \t\n\f\r]+", " ", txt).strip(" ").lower()


def _py_alias_rows(rows) -> dict:
    """(alias, dst_canon) -> (n_pages, n_hosts), the pure-Python third
    implementation of mine_anchor_aliases."""
    from collections import defaultdict

    pages, hosts = defaultdict(set), defaultdict(set)
    for url, html in rows:
        src = _py_canon(url)
        src_host = re.sub(
            r":[0-9]+$",
            "",
            re.match(r"^[a-z0-9+.\-]+://(?:[^/?]*@)?([^/?@]*)", src).group(1),
        )
        h = html.decode("utf-8")
        for href, txt in _PAIR_DQ.findall(h) + _PAIR_SQ.findall(h):
            dst_abs = _py_resolve(src, href)
            alias = _py_alias(txt)
            if dst_abs is None or alias == "":
                continue
            key = (alias, _py_canon(dst_abs))
            pages[key].add(src)
            hosts[key].add(src_host)
    return {k: (len(pages[k]), len(hosts[k])) for k in pages}


class TestAnchorAliases:
    def test_spark_matches_python_reference_on_fixture(self, spark):
        from deepex_spark.operators.urls import mine_anchor_aliases

        pages = spark.read.parquet(FIXTURE)
        got = {
            (r["alias"], r["dst_canon"]): (r["n_pages"], r["n_hosts"])
            for r in mine_anchor_aliases(pages).collect()
        }
        want = _py_alias_rows(
            [(r["url"], bytes(r["html"])) for r in pages.collect()]
        )
        assert got == want and len(got) > 100

    def test_alias_normalization_and_spec_bounds(self, spark):
        """Surface case/whitespace variants collapse to one alias; nested
        markup truncates the text to '' (dropped); non-http(s) and
        unquoted-href anchors never contribute."""
        from deepex_spark.operators.urls import mine_anchor_aliases

        html = (
            '<a href="/x">  Apache  SPARK </a>'
            "<a href='/x'>apache\nspark</a>"
            '<a href="/x">APACHE\tSPARK</a>'
            '<a href="/y"><b>bold</b></a>'
            '<a href="mailto:a@b">Apache Spark</a>'
            "<a href=unq>Apache Spark</a>"
        ).encode()
        pages = spark.createDataFrame(
            [("https://h1.example.org/a", html), ("http://h2.example.org/b", html)],
            "url string, html binary",
        )
        rows = mine_anchor_aliases(pages).collect()
        # '/x' resolves per-page -> one (alias, dst) group per host; the
        # three surface variants on each page collapse to ONE alias row
        # with n_pages = n_hosts = 1
        assert [
            (r["alias"], r["dst_canon"], r["n_pages"], r["n_hosts"])
            for r in sorted(rows, key=lambda r: r["dst_canon"])
        ] == [
            ("apache spark", "http://h2.example.org/x", 1, 1),
            ("apache spark", "https://h1.example.org/x", 1, 1),
        ]

    def test_dict_argmax_and_confidence(self, spark):
        """Dominant target wins with its page-share as confidence; ties
        break by dst_canon ascending."""
        from deepex_spark.operators.urls import anchor_alias_dict

        def page(url, dst):
            return (url, f'<a href="{dst}">Ada  Lovelace</a>'.encode())

        pages = spark.createDataFrame(
            [
                page("https://a.example.org/1", "https://t.example.org/ada"),
                page("https://b.example.org/2", "https://t.example.org/ada"),
                page("https://c.example.org/3", "https://wrong.example.org/x"),
            ],
            "url string, html binary",
        )
        rows = anchor_alias_dict(pages).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["alias"] == "ada lovelace"
        assert r["dst_canon"] == "https://t.example.org/ada"
        assert (r["n_pages"], r["n_hosts"]) == (2, 2)
        assert abs(r["confidence"] - 2 / 3) < 1e-6
