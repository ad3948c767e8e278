"""Label-propagation communities (operators/graph.py::label_propagation).

The registered ``web_host_communities`` query is hash-verified against an
unrolled-SQL DuckDB oracle by the driver; these tests cross-check the
operator against an independent pure-Python implementation of the same
synchronous rule on graphs richer than the 7-host links fixture, and pin
the determinism contract (partition/row-order invariance, self-loop
drop)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from deepex_spark.operators.graph import label_propagation


def _lpa_ref(edges, n_iter):
    """Independent single-node reference of the synchronous rule:
    lab_{t+1}(v) = argmax over neighbor-label multiplicity at t, ties to
    min label; neighbors = distinct, self-loops dropped."""
    nbrs: dict = {}
    for u, w in edges:
        if u == w:
            continue
        nbrs.setdefault(u, set()).add(w)
        nbrs.setdefault(w, set()).add(u)
    lab = {v: v for v in nbrs}
    for _ in range(n_iter):
        nxt = {}
        for v, ns in nbrs.items():
            c = Counter(lab[n] for n in ns)
            best = max(c.items(), key=lambda kv: (kv[1], _neg(kv[0])))
            nxt[v] = best[0]
        lab = nxt
    return lab


def _neg(x):
    # max() with (count, -label) tie-break; works for ints and strings
    # via a wrapper that inverts comparison
    class Rev:
        def __init__(self, v):
            self.v = v

        def __lt__(self, other):
            return self.v > other.v

    return Rev(x)


def _run(spark, edges, n_iter=3, parts=1):
    df = spark.createDataFrame(edges, "src int, dst int")
    if parts > 1:
        df = df.repartition(parts)
    out = label_propagation(df, n_iter=n_iter)
    return {r.v: r.community for r in out.collect()}


def test_lpa_matches_reference_barbell(spark):
    # two 4-cliques joined by one bridge edge
    cl = lambda vs: [(a, b) for a in vs for b in vs if a < b]
    edges = cl([1, 2, 3, 4]) + cl([11, 12, 13, 14]) + [(4, 11)]
    for it in (1, 2, 3, 5):
        assert _run(spark, edges, n_iter=it) == _lpa_ref(edges, it), it


def test_lpa_matches_reference_star_and_path(spark):
    star = [(0, i) for i in range(1, 6)]
    path = [(i, i + 1) for i in range(6)]
    assert _run(spark, star) == _lpa_ref(star, 3)
    assert _run(spark, path) == _lpa_ref(path, 3)


def test_lpa_partition_and_order_invariant(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    a = _run(spark, edges, parts=1)
    b = _run(spark, list(reversed(edges)), parts=7)
    assert a == b


def test_lpa_drops_self_loops_and_dups(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3)]
    clean = [(1, 2), (2, 3)]
    assert _run(spark, edges) == _lpa_ref(clean, 3)
