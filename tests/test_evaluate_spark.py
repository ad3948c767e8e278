"""Distributed O30 evaluation: normalizeKey semantics + driver-path parity.

The reference (scripts/oie/benchmark.py:58-59, 136-167) normalizes both gold
and predicted sentence keys (strip spaces, PTB-unescape, strip punctuation)
before matching; real supervised-oie gold files carry PTB escapes like
``-LRB-``, so without this the keys never join and recall collapses.
"""

import math

import pytest

from deepex_spark.operators.evaluate import (
    evaluate_oie_spark,
    match_counts,
    normalize_key,
    normalize_sent_col,
    pr_auc,
    pr_curve,
)


def test_normalize_key_ptb_unescape():
    # spaces stripped FIRST, then PTB unescape, then punctuation strip
    assert normalize_key("Marie Curie -LRB- the chemist -RRB- studied .") == (
        "MarieCuriethechemiststudied"
    )
    assert normalize_key("Marie Curie (the chemist) studied.") == (
        "MarieCuriethechemiststudied"
    )
    # idempotent (the spark matcher normalizes before grouping AND inside
    # the per-group driver matcher)
    k = normalize_key("a -LSB- b -RSB- {c}")
    assert normalize_key(k) == k


def test_normalize_sent_col_matches_python(spark):
    samples = [
        "Marie Curie -LRB- the chemist -RRB- studied in Paris .",
        "plain sentence no escapes",
        "punct!@#$%^&*()_+-=[]{}|;':\",./<>?here",
        "double  spaces   and -LCB- braces -RCB-",
        "",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in samples], "sent string")
    got = [r[0] for r in df.select(normalize_sent_col(F.col("sent"))).collect()]
    assert got == [normalize_key(s) for s in samples]


def test_ptb_escaped_gold_matches_raw_pred():
    """A -LRB--escaped gold sentence must match the raw predicted sentence."""
    gold = [
        ("Marie Curie -LRB- the chemist -RRB- studied in Paris .",
         "studied in", ["Marie Curie", "Paris"]),
    ]
    pred = [
        ("Marie Curie (the chemist) studied in Paris.",
         "studied in", ["Marie Curie", "Paris"], 0.9),
    ]
    y_true, y_scores, total, unmatched = match_counts(gold, pred)
    assert total == 1 and unmatched == 0 and sum(y_true) == 1


def _driver_metrics(gold, pred):
    y_true, y_scores, total, unmatched = match_counts(gold, pred)
    matched = sum(y_true)
    precision = matched / len(y_true) if y_true else 0.0
    mult = (total - unmatched) / total if total else 0.0
    curve, best = pr_curve(y_true, y_scores, mult)
    return {
        "precision": precision,
        "recall": mult,
        "optimal_f1": best[2],
        "auc": pr_auc(curve),
        "auc_points": len(curve),
        "n_gold": total,
        "n_pred": len(pred),
    }


def test_pr_curve_auc_sklearn_golden():
    """Hand-checked against sklearn's precision_recall_curve + auc
    (reference benchmark.py:101-134) on a fixture with a MIXED-LABEL TIE at
    0.8 — pins the all-ties-in threshold semantics. sklearn points
    (threshold desc): (1, 1/3) @.9, (2/3, 2/3) @.8, (3/4, 1) @.7,
    (3/5, 1) @.6, anchored at (precision 1, recall 0):
    AUC = 1/3 + 1/3*(1+2/3)/2 + 1/3*(2/3+3/4)/2 + 0 = 61/72."""
    y_true = [1, 0, 1, 1, 0]
    y_scores = [0.9, 0.8, 0.8, 0.7, 0.6]
    curve, best = pr_curve(y_true, y_scores, 1.0)
    assert [(round(p, 12), round(r, 12), s) for p, r, s in curve] == [
        (round(1 / 1, 12), round(1 / 3, 12), 0.9),
        (round(2 / 3, 12), round(2 / 3, 12), 0.8),
        (round(3 / 4, 12), round(1.0, 12), 0.7),
        (round(3 / 5, 12), round(1.0, 12), 0.6),
    ]
    # optimal F1 = 6/7 at threshold 0.7 (sklearn max over threshold points)
    assert math.isclose(best[2], 6 / 7, rel_tol=1e-12) and best[3] == 0.7
    assert math.isclose(pr_auc(curve), 61 / 72, rel_tol=1e-12)


def test_evaluate_oie_spark_auc_matches_driver_with_ties(spark):
    """Distributed AUC/optimal-F1 equals the driver path on a fixture with
    tied scores (two predictions at distance 0.2)."""
    gold_rows = [
        ("t one .", "born in", ["Obama", "Hawaii"]),
        ("t one .", "lives in", ["Obama", "Washington"]),
        ("t two .", "works at", ["Curie", "Institute"]),
    ]
    pred_rows = [
        ("t one .", "born in", "Obama", "Hawaii", 0.2),
        ("t one .", "made of", "cheese", "moon", 0.2),
        ("t two .", "works at", "Curie", "Institute", 0.4),
    ]
    gold = spark.createDataFrame(gold_rows, "sent string, rel string, args array<string>")
    pred = spark.createDataFrame(
        pred_rows, "sentence string, rel string, subj string, obj string, contrastive_dis double"
    )
    got = evaluate_oie_spark(pred, gold)
    g = [(s, r, list(a)) for s, r, a in gold_rows]
    p = [(s, r, [su, ob], -d) for s, r, su, ob, d in pred_rows]
    want = _driver_metrics(g, p)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12), (k, got[k], want[k])


def test_evaluate_oie_spark_matches_driver_path(spark):
    """Same numbers as the in-driver matcher+pr_curve, computed without a
    single collect of gold or predicted triples (distinct scores so the
    tie order can't differ)."""
    gold_rows = [
        ("s one .", "born in", ["Obama", "Hawaii"]),
        ("s one .", "lives in", ["Obama", "Washington"]),
        ("s two .", "works at", ["Curie", "Institute"]),
        ("s three gold only .", "heads", ["Smith", "Board"]),
    ]
    pred_rows = [
        # (sentence, rel, subj, obj, contrastive_dis)
        ("s one .", "born in", "Obama", "Hawaii", 0.10),
        ("s one .", "made of", "cheese", "moon", 0.90),
        ("s two .", "works at", "Curie", "Institute", 0.20),
        ("s four pred only .", "eats", "cat", "fish", 0.30),
    ]
    gold = spark.createDataFrame(gold_rows, "sent string, rel string, args array<string>")
    pred = spark.createDataFrame(
        pred_rows, "sentence string, rel string, subj string, obj string, contrastive_dis double"
    )
    got = evaluate_oie_spark(pred, gold)

    g = [(s, r, list(a)) for s, r, a in gold_rows]
    p = [(s, r, [su, ob], -d) for s, r, su, ob, d in pred_rows]
    want = _driver_metrics(g, p)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12), (k, got[k], want[k])


def test_evaluate_oie_task_no_triple_collect(spark, monkeypatch):
    """The task entry must not collect the triples — only scalar aggregates."""
    from deepex_spark.tasks import evaluate_oie_task

    gold = spark.createDataFrame(
        [("s .", "born in", ["Obama", "Hawaii"])],
        "sent string, rel string, args array<string>",
    )
    pred = spark.createDataFrame(
        [("s .", "born in", "Obama", "Hawaii", 0.5)],
        "sentence string, rel string, subj string, obj string, score double",
    )

    # patch the CONCRETE DataFrame class (pyspark 4 classic subclass
    # overrides collect; patching the pyspark.sql.DataFrame base is a no-op)
    DataFrame = type(gold)
    real_collect = DataFrame.collect
    seen = []

    def tracking_collect(self):
        rows = real_collect(self)
        seen.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", tracking_collect)
    metrics = evaluate_oie_task(pred, gold)
    assert metrics["precision"] == 1.0 and metrics["recall"] == 1.0
    # every collect along the way returns a scalar-sized frame (aggregates),
    # never the triples themselves
    assert seen and max(seen) <= 4


def test_evaluate_oie_spark_no_matches(spark):
    gold = spark.createDataFrame(
        [("s .", "born in", ["Obama", "Hawaii"])],
        "sent string, rel string, args array<string>",
    )
    pred = spark.createDataFrame(
        [("other .", "eats", "cat", "fish", 0.5)],
        "sentence string, rel string, subj string, obj string, score double",
    )
    got = evaluate_oie_spark(pred, gold)
    assert got["optimal_f1"] == 0.0 and got["auc_points"] == 0
    assert got["n_gold"] == 1 and got["n_pred"] == 1
