"""Deterministic random walks (operators/graph.py::random_walks).

The registered ``kg_random_walks`` query is hash-verified against a
DuckDB unrolled-join oracle; these tests cross-check the pick arithmetic
against an independent pure-Python reference and pin the determinism and
validity contracts."""

from __future__ import annotations

import hashlib

from deepex_spark.operators.graph import random_walks


def _ref_walks(edges, walk_len):
    nbrs: dict = {}
    for u, w in edges:
        if u == w:
            continue
        nbrs.setdefault(u, set()).add(w)
        nbrs.setdefault(w, set()).add(u)
    adj = {u: sorted(ns) for u, ns in nbrs.items()}
    rows = set()
    for start in adj:
        v = start
        rows.add((start, 0, v))
        for t in range(1, walk_len + 1):
            hexd = hashlib.md5(f"{start}|{t}|{v}".encode()).hexdigest()
            h = ord(hexd[0]) * 16384 + ord(hexd[1]) * 128 + ord(hexd[2])
            v = adj[v][h % len(adj[v])]
            rows.add((start, t, v))
    return rows


def _run(spark, edges, walk_len=4, parts=1):
    df = spark.createDataFrame(edges, "src int, dst int")
    if parts > 1:
        df = df.repartition(parts)
    out = random_walks(df, walk_len=walk_len)
    return {(r.start, r.step, r.v) for r in out.collect()}


def test_walks_match_reference(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (1, 6)]
    for wl in (1, 3):
        assert _run(spark, edges, walk_len=wl) == _ref_walks(edges, wl), wl


def test_walks_partition_invariant_and_valid(spark):
    edges = [(i, i + 1) for i in range(8)] + [(0, 8), (2, 6)]
    a = _run(spark, edges, parts=1)
    b = _run(spark, list(reversed(edges)), parts=5)
    assert a == b
    # every non-zero step traverses a real (symmetrized) edge
    sym = {(u, w) for u, w in edges} | {(w, u) for u, w in edges}
    by_walker: dict = {}
    for start, step, v in a:
        by_walker.setdefault(start, {})[step] = v
    for start, path in by_walker.items():
        assert path[0] == start
        assert len(path) == 4 + 1
        for t in range(1, 5):
            assert (path[t - 1], path[t]) in sym


def _ref_walks_multi(edges, walk_len, n_walks):
    nbrs: dict = {}
    for u, w in edges:
        if u == w:
            continue
        nbrs.setdefault(u, set()).add(w)
        nbrs.setdefault(w, set()).add(u)
    adj = {u: sorted(ns) for u, ns in nbrs.items()}
    rows = set()
    for start in adj:
        for wk in range(n_walks):
            key = str(start) if wk == 0 else f"{start}#{wk}"
            v = start
            rows.add((start, wk, 0, v))
            for t in range(1, walk_len + 1):
                hexd = hashlib.md5(f"{key}|{t}|{v}".encode()).hexdigest()
                h = ord(hexd[0]) * 16384 + ord(hexd[1]) * 128 + ord(hexd[2])
                v = adj[v][h % len(adj[v])]
                rows.add((start, wk, t, v))
    return rows


def test_multi_walks_match_reference_and_walk0_legacy(spark):
    """n_walks=3 must match the pure-Python reference, walk 0 must be
    byte-identical to the single-walk corpus (the back-compat contract
    that keeps existing oracles stable), and walks must actually
    diverge across wk."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (1, 6)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = random_walks(df, walk_len=3, n_walks=3)
    got = {(r.start, r.wk, r.step, r.v) for r in out.collect()}
    assert got == _ref_walks_multi(edges, 3, 3)
    legacy = {
        (r.start, r.step, r.v)
        for r in random_walks(df, walk_len=3).collect()
    }
    assert {(s, t, v) for (s, w, t, v) in got if w == 0} == legacy
    paths = {}
    for s, w, t, v in sorted(got):
        paths.setdefault((s, w), []).append(v)
    starts_with_divergence = {
        s for (s, w), p in paths.items() if p != paths[(s, 0)]
    }
    assert starts_with_divergence
