"""Pinned-quality regression gate: recompute the fixture-corpus
P / R / optimal-F1 / AUC and assert the exact numbers pinned in
BENCH/QUALITY.md (written by tools/make_quality.py).

Throughput has pinned regression numbers (BENCH_r*.json); this pins
quality the same way — a drift in ANY stage (normalize, sentencize,
tokenize, kernel, distill, rerank, matcher, PR/AUC derivation) moves at
least one of the four numbers. Tolerance 1e-9 absorbs only
float-summation order across partitionings, nothing semantic."""

import os
import re

QUALITY_MD = os.path.join(os.path.dirname(__file__), "..", "BENCH", "QUALITY.md")


def _pinned() -> dict:
    with open(QUALITY_MD) as f:
        txt = f.read()
    row = None
    for line in txt.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) == 6 and re.match(r"^\d", cells[0]):
            row = cells
    assert row, f"no pinned row in {QUALITY_MD}"
    return {
        "precision": float(row[0]),
        "recall": float(row[1]),
        "optimal_f1": float(row[2]),
        "auc": float(row[3]),
        "n_gold": int(row[4]),
        "n_pred": int(row[5]),
    }


def test_quality_matches_pinned_table(spark):
    from tools.make_quality import compute_metrics

    pinned = _pinned()
    m = compute_metrics(spark)
    assert m["n_gold"] == pinned["n_gold"]
    assert m["n_pred"] == pinned["n_pred"]
    for k in ("precision", "recall", "optimal_f1", "auc"):
        assert abs(m[k] - pinned[k]) < 1e-9, (k, m[k], pinned[k])
    # the perturbation protocol guarantees all four live strictly in (0,1):
    # every stage's drift is visible in at least one of them
    for k in ("precision", "recall", "optimal_f1", "auc"):
        assert 0.0 < m[k] < 1.0, (k, m[k])
