"""Incremental KG maintenance (operators/graph.py::merge_vertices /
merge_edges): folding doc-disjoint batches must equal the single-batch
build — the associativity that makes incremental crawls safe."""

import pytest
from pyspark.sql import functions as F

from deepex_spark.config import DeepExConfig
from deepex_spark.operators.canonicalize import canonicalize_triples
from deepex_spark.operators.graph import (
    build_edges,
    build_vertices,
    merge_edges,
    merge_vertices,
)
from deepex_spark.pipeline import extract_triples


@pytest.fixture(scope="module")
def canon_halves(spark):
    from deepex_spark.sources.pages import synth_pages

    cfg = DeepExConfig.small()
    pages = synth_pages(spark, n_docs=24, seed=3).persist()
    half_a = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    half_b = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    out = tuple(
        canonicalize_triples(extract_triples(p, cfg)).persist()
        for p in (pages, half_a, half_b)
    )
    yield out
    pages.unpersist()


def _vrows(df):
    return {
        (r["entity_id"], r["canonical"], r["n_docs"], r["n_mentions"], tuple(r["surfaces"]))
        for r in df.collect()
    }


def _erows(df):
    return {
        (
            r["subj_id"], r["obj_id"], r["pred_id"], r["pred_canon"],
            r["n_evidence"], r["n_docs"],
            round(r["max_score"], 6), round(r["sum_score"], 6),
            r["sample_docid"],
        )
        for r in df.collect()
    }


def test_vertex_merge_equals_single_batch(canon_halves):
    full, a, b = canon_halves
    merged = merge_vertices(build_vertices(a), build_vertices(b))
    assert _vrows(merged) == _vrows(build_vertices(full))


def test_edge_merge_equals_single_batch(canon_halves):
    full, a, b = canon_halves
    merged = merge_edges(build_edges(a), build_edges(b))
    assert _erows(merged) == _erows(build_edges(full))


def test_merge_is_order_insensitive(canon_halves):
    _, a, b = canon_halves
    ab = _erows(merge_edges(build_edges(a), build_edges(b)))
    ba = _erows(merge_edges(build_edges(b), build_edges(a)))
    assert ab == ba


def test_empty_delta_is_identity(spark, canon_halves):
    _, a, _ = canon_halves
    va = build_vertices(a)
    empty = va.limit(0)
    assert _vrows(merge_vertices(va, empty)) == _vrows(va)


def test_maintain_job_snapshot_merge(spark, tmp_path, canon_halves):
    """End-to-end incremental maintenance: materialize batch A as the live
    KG, batch B as a delta catalog, run jobs/maintain_kg.maintain — the
    published snapshot must equal the single-batch build over A ∪ B, and
    the table is now snapshot-versioned (v1)."""
    from deepex_spark.operators.graph import materialize_graph
    from deepex_spark.plans.catalog import Catalog
    from jobs.maintain_kg import maintain

    full, a, b = canon_halves
    live = Catalog(str(tmp_path / "live"))
    delta = Catalog(str(tmp_path / "delta"))
    materialize_graph(a, live, run_id="runA")
    materialize_graph(b, delta, run_id="runB")

    report = maintain(spark, live, delta, run_id="m1")
    assert report["vertices"][0] == 1 and report["edges"][0] == 1

    merged_v = live.read_snapshot(spark, "vertices")
    assert _vrows(merged_v) == _vrows(build_vertices(full))
    merged_e = live.read_snapshot(spark, "edges")
    assert _erows(merged_e) == _erows(build_edges(full))
    # lineage columns present and bucketed layout preserved
    assert {"run_id", "src_partition", "bucket"} <= set(merged_v.columns)


def test_maintain_job_idempotent_per_run_id(spark, tmp_path, canon_halves):
    """Retrying maintain with the SAME run_id (the partial-failure
    recovery protocol) must NOT re-merge the delta — statistics stay
    identical, no new snapshot version is published."""
    from deepex_spark.operators.graph import materialize_graph
    from deepex_spark.plans.catalog import Catalog
    from jobs.maintain_kg import maintain

    _full, a, b = canon_halves
    live = Catalog(str(tmp_path / "live"))
    delta = Catalog(str(tmp_path / "delta"))
    materialize_graph(a, live, run_id="runA")
    materialize_graph(b, delta, run_id="runB")

    r1 = maintain(spark, live, delta, run_id="m1")
    r2 = maintain(spark, live, delta, run_id="m1")  # retry
    assert r1 == r2  # same versions, same counts — nothing double-merged
    # only m1's publication exists; the retry did not publish
    assert live.snapshot_run_ids("vertices") == {"m1"}
    assert live._snapshot_manifest("vertices")["current"] == r1["vertices"][0]

    # a LATE retry of m1 after a subsequent merge reports m1's OWN
    # version, not whatever is current (mechanics check: m2 reuses the
    # same delta, which doc-disjointness forbids semantically — here we
    # only care that versions advance and the skip path stays pinned)
    maintain(spark, live, delta, run_id="m2")
    r1_late = maintain(spark, live, delta, run_id="m1")
    assert r1_late["vertices"][0] == r1["vertices"][0]
    assert live._snapshot_manifest("vertices")["current"] > r1["vertices"][0]
