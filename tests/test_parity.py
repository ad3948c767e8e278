"""Spark vs single-node local oracle: exact row-level parity, and
invariance to partitioning (determinism under parallelism — required for
the N vs 4N scaling claim)."""

import pytest

from deepex_spark.config import DeepExConfig
from deepex_spark.local_oracle import local_pipeline
from deepex_spark.sources.pages import PAGES_SCHEMA, synth_page_rows


CFG = DeepExConfig.task(dist_const=2)  # bounded pair search for test speed

KEY_COLS = [
    "docid", "subj", "rel", "obj", "subj_s", "subj_e", "obj_s", "obj_e",
    "sentence", "score", "offset", "is_rev", "doc_rank", "rank",
]


def _spark_rows(spark, rows, cfg, n_partitions=4, rerank=True):
    from deepex_spark.pipeline import extract_triples

    pages = spark.createDataFrame(rows, PAGES_SCHEMA).repartition(n_partitions)
    tri = extract_triples(pages, cfg, rerank=rerank)
    out = set()
    for r in tri.collect():
        out.add(
            (
                r["docid"], r["subj"], r["rel"], r["obj"],
                (r["subj_s"], r["subj_e"]), (r["obj_s"], r["obj_e"]),
                r["sentence"], round(r["score"], 12), r["offset"],
                r["is_rev"], r["doc_rank"] if "doc_rank" in r.__fields__ else None,
                r["rank"],
            )
        )
    return out


def _local_rows(rows, cfg, rerank=True):
    pages = [(r[0], r[3]) for r in rows]  # (url, text)
    out = set()
    for r in local_pipeline(pages, cfg, rerank=rerank):
        out.add(
            (
                r["docid"], r["subj"], r["rel"], r["obj"],
                (r["subj_s"], r["subj_e"]), (r["obj_s"], r["obj_e"]),
                r["sentence"], round(r["score"], 12), r["offset"],
                r["is_rev"], r.get("doc_rank"), r["rank"],
            )
        )
    return out


@pytest.fixture(scope="module")
def corpus():
    return synth_page_rows(n_docs=25, seed=7)


def test_spark_matches_local_oracle(spark, corpus):
    got = _spark_rows(spark, corpus, CFG)
    want = _local_rows(corpus, CFG)
    missing = want - got
    extra = got - want
    assert not missing and not extra, (
        f"missing={list(missing)[:3]} extra={list(extra)[:3]} "
        f"(|got|={len(got)}, |want|={len(want)})"
    )


def test_partitioning_invariance(spark, corpus):
    one = _spark_rows(spark, corpus, CFG, n_partitions=1)
    eight = _spark_rows(spark, corpus, CFG, n_partitions=8)
    assert one == eight


def test_unsort_mode_matches_local(spark, corpus):
    got = _spark_rows(spark, corpus[:10], CFG, rerank=False)
    want = _local_rows(corpus[:10], CFG, rerank=False)
    assert got == want
