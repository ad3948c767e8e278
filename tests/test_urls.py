"""URL canonicalization spec edge cases (operators/urls.py). The fixture-
level Spark==DuckDB equivalence is covered by the url_canonicalize /
crawl_keep_newest oracles; these pin the per-rule semantics the oracle
corpus may not isolate."""

from datetime import datetime

from pyspark.sql import functions as F

from deepex_spark.operators.urls import (
    canonicalize_urls,
    crawl_snapshot,
    normalize_url,
)


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(normalize_url(F.col("url")).alias("c")).collect()[0]["c"]


def _canon_host(spark, url: str):
    df = canonicalize_urls(spark.createDataFrame([(url,)], "url string"))
    r = df.collect()[0]
    return r["canon_url"], r["host"]


class TestNormalizeUrl:
    def test_fragment_stripped(self, spark):
        assert _canon(spark, "https://a.org/p#sec") == "https://a.org/p"

    def test_scheme_host_lowered_path_case_preserved(self, spark):
        assert _canon(spark, "HTTPS://A.ORG/CaseSensitive") == "https://a.org/CaseSensitive"

    def test_www_stripped(self, spark):
        assert _canon(spark, "https://www.a.org/p") == "https://a.org/p"

    def test_default_port_stripped_per_scheme(self, spark):
        assert _canon(spark, "http://a.org:80/p") == "http://a.org/p"
        assert _canon(spark, "https://a.org:443/p") == "https://a.org/p"

    def test_cross_scheme_default_ports_kept(self, spark):
        # :443 on http / :80 on https are NOT that scheme's default
        assert _canon(spark, "http://a.org:443/p") == "http://a.org:443/p"
        assert _canon(spark, "https://a.org:80/p") == "https://a.org:80/p"

    def test_nondefault_port_kept(self, spark):
        assert _canon(spark, "https://a.org:8080/p") == "https://a.org:8080/p"
        # :8080 must not lose its '80' suffix to the :80 rule
        assert _canon(spark, "http://a.org:8080/p") == "http://a.org:8080/p"

    def test_trailing_slashes_stripped(self, spark):
        assert _canon(spark, "https://a.org/p/") == "https://a.org/p"
        assert _canon(spark, "https://a.org/p//") == "https://a.org/p"
        # bare host: root slash collapses to the empty path
        assert _canon(spark, "https://a.org/") == "https://a.org"

    def test_tracking_params_dropped_rest_sorted(self, spark):
        assert (
            _canon(spark, "https://a.org/p?b=2&utm_source=x&a=1")
            == "https://a.org/p?a=1&b=2"
        )
        # utm with no '=' and bare fbclid also match the (=|$) tail
        assert _canon(spark, "https://a.org/p?utm_x&fbclid") == "https://a.org/p"

    def test_query_dropped_when_all_tracking(self, spark):
        assert _canon(spark, "https://a.org/p?gclid=xyz") == "https://a.org/p"

    def test_utm_prefix_param_names_kept(self, spark):
        # 'utmost=1' must not be swallowed by the utm_ rule
        assert _canon(spark, "https://a.org/p?utmost=1") == "https://a.org/p?utmost=1"

    def test_idempotent(self, spark):
        once = _canon(spark, "HTTPS://WWW.A.ORG:443/p/?b=2&a=1&gclid=z#f")
        assert once == "https://a.org/p?a=1&b=2"
        assert _canon(spark, once) == once

    def test_host_extracted_port_stripped(self, spark):
        canon, host = _canon_host(spark, "HTTPS://WWW.A.ORG:8080/p?x=1")
        assert canon == "https://a.org:8080/p?x=1"
        assert host == "a.org"


class TestCrawlSnapshot:
    def _pages(self, spark, rows):
        return spark.createDataFrame(
            [(u, ts, b"", "t", "en") for u, ts in rows],
            "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
        )

    def test_newest_kept_and_variant_count(self, spark):
        pages = self._pages(
            spark,
            [
                ("https://a.org/p", datetime(2024, 1, 1)),
                ("HTTPS://WWW.A.ORG/p/#x", datetime(2024, 1, 3)),
                ("https://a.org/p?utm_source=s", datetime(2024, 1, 2)),
                ("https://b.org/q", datetime(2024, 1, 1)),
            ],
        )
        out = {r["canon_url"]: r for r in crawl_snapshot(pages).collect()}
        a = out["https://a.org/p"]
        assert a["url"] == "HTTPS://WWW.A.ORG/p/#x"  # newest fetch
        assert a["n_variants"] == 3
        assert out["https://b.org/q"]["n_variants"] == 1

    def test_timestamp_tie_breaks_by_url_asc(self, spark):
        ts = datetime(2024, 1, 1)
        pages = self._pages(
            spark,
            [("https://a.org/p#b", ts), ("https://a.org/p#a", ts)],
        )
        out = crawl_snapshot(pages).collect()
        assert len(out) == 1
        assert out[0]["url"] == "https://a.org/p#a"

    def test_rank_only_path_same_rows_and_group_limit_plan(self, spark):
        pages = self._pages(
            spark,
            [
                ("https://a.org/p", datetime(2024, 1, 1)),
                ("https://www.a.org/p/", datetime(2024, 1, 2)),
                ("https://b.org/q", datetime(2024, 1, 1)),
            ],
        )
        full = {
            (r["canon_url"], r["url"]) for r in crawl_snapshot(pages).collect()
        }
        lean = crawl_snapshot(pages, with_counts=False)
        assert {(r["canon_url"], r["url"]) for r in lean.collect()} == full
        # the scale path must push a per-partition top-1 below the exchange
        plan = lean._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestDedupRefetches:
    def test_schema_preserved_and_rekeyed(self, spark):
        from deepex_spark.operators.urls import dedup_refetches

        pages = spark.createDataFrame(
            [
                ("https://a.org/p", datetime(2024, 1, 1), b"old", "old text", "en"),
                ("HTTPS://WWW.A.ORG/p/?utm_source=x", datetime(2024, 1, 2), b"new", "new text", "en"),
                ("https://b.org/q", datetime(2024, 1, 1), b"b", "b text", "de"),
            ],
            "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
        )
        out = dedup_refetches(pages)
        assert out.columns == pages.columns
        rows = {r["url"]: r for r in out.collect()}
        assert set(rows) == {"https://a.org/p", "https://b.org/q"}
        # the NEWEST fetch's payload survives, keyed by the canonical url
        assert rows["https://a.org/p"]["text"] == "new text"
        assert bytes(rows["https://a.org/p"]["html"]) == b"new"
        assert rows["https://b.org/q"]["lang"] == "de"

    def test_rank_only_group_limit_plan(self, spark):
        from deepex_spark.operators.urls import dedup_refetches

        pages = spark.createDataFrame(
            [("https://a.org/p", datetime(2024, 1, 1), b"", "t", "en")],
            "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
        )
        plan = dedup_refetches(pages)._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestHostStats:
    def test_counts_and_refetch_ratio(self, spark):
        from deepex_spark.operators.urls import host_stats

        pages = spark.createDataFrame(
            [
                ("https://a.org/p", datetime(2024, 1, 1), b"", "t", "en"),
                ("https://www.a.org/p/", datetime(2024, 1, 2), b"", "t", "en"),
                ("https://a.org/q", datetime(2024, 1, 3), b"", "t", "en"),
                ("https://b.org/r", datetime(2024, 1, 1), b"", "t", "en"),
            ],
            "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
        )
        out = {r["host"]: r for r in host_stats(pages).collect()}
        a = out["a.org"]
        assert (a["n_fetches"], a["n_pages"]) == (3, 2)
        assert a["refetch_ratio"] == 1.5
        assert a["last_fetch"] == datetime(2024, 1, 3)
        assert out["b.org"]["refetch_ratio"] == 1.0


def _py_canon(url: str) -> str:
    """Independent pure-Python reference of the normalize_url spec (third
    implementation alongside the Spark column algebra and the DuckDB
    oracle — any pairwise divergence flags a spec ambiguity)."""
    import re

    nofrag = url.split("#", 1)[0]
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*", nofrag)
    prefix = m.group(0) if m else ""
    rest = nofrag[len(prefix):]
    prefix = prefix.lower()
    prefix = re.sub(r"^(https?://)www\.", r"\1", prefix)
    if prefix.startswith("http://") and prefix.endswith(":80"):
        prefix = prefix[:-3]
    elif prefix.startswith("https://") and prefix.endswith(":443"):
        prefix = prefix[:-4]
    path, _, query = rest.partition("?")
    path = re.sub(r"/+$", "", path)
    kept = sorted(
        p
        for p in query.split("&")
        if p and not re.match(r"^(utm_[^=]*|fbclid|gclid)(=|$)", p)
    )
    q2 = "&".join(kept)
    return prefix + path + (("?" + q2) if q2 else "")


class TestNormalizeUrlReference:
    def test_spark_matches_python_reference_on_generated_mess(self, spark):
        import random

        rng = random.Random(5127)
        urls = []
        for _ in range(300):
            scheme = rng.choice(["http", "https", "HTTP", "Https", "ftp"])
            www = rng.choice(["", "www.", "WWW.", "Www."])
            host = rng.choice(["a.org", "A.ORG", "sub.B-c.Org", "x1.example.net"])
            port = rng.choice(["", ":80", ":443", ":8080", ":8443"])
            path = rng.choice(["", "/", "/P/q", "/p", "/CaseY/z", "/p/", "/p//"])
            params = rng.sample(
                ["a=1", "B=2", "utm_source=x", "gclid=z", "q=Spark", "utmost=1", "fbclid"],
                rng.randint(0, 4),
            )
            query = ("?" + "&".join(params)) if params else ""
            frag = rng.choice(["", "#x", "#Sec"])
            urls.append(f"{scheme}://{www}{host}{port}{path}{query}{frag}")
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {
            r["url"]: r["c"]
            for r in df.select("url", normalize_url(F.col("url")).alias("c")).collect()
        }
        for u in urls:
            assert got[u] == _py_canon(u), u

    def test_idempotent_on_generated_mess(self, spark):
        # canon(canon(u)) == canon(u) for the same generated population
        import random

        rng = random.Random(40)
        urls = [
            f"{rng.choice(['HTTP','https'])}://{rng.choice(['www.',''])}H{i}.Org"
            f"{rng.choice([':443',':80',''])}/p{i}{rng.choice(['/','//',''])}"
            f"{rng.choice(['?b=2&utm_x&a=1','?gclid=1',''])}{rng.choice(['#f',''])}"
            for i in range(100)
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        once = df.select(normalize_url(F.col("url")).alias("c"))
        twice = once.select("c", normalize_url(F.col("c")).alias("c2"))
        assert twice.where(F.col("c") != F.col("c2")).count() == 0
