"""OIE evaluation (O30): lexical-match P/R against gold triples.

Re-implements the reference's benchmark comparator semantics
(``scripts/oie/benchmark.py:40-134`` + ``scripts/oie/matcher.py:84-109``):

* an extraction's bag-of-words is ``"relation arg1 arg2"``
  (``extraction.py:102-103``);
* lexicalMatch: for each gold word, count every equal predicted word
  (duplicates multiply — the reference's nested loop), coverage =
  count / len(gold_bow); match if coverage > 0.5; stopwords and case
  removed first (``matcher.py:84-109``);
* greedy one-to-one matching: per gold extraction, the first not-yet-
  matched predicted extraction that passes lexicalMatch claims it
  (``benchmark.py:69-90``);
* precision/recall over all predictions, PR curve by descending score with
  the unmatched-gold recall multiplier, optimal F1 (``benchmark.py:119-134``).

The driver-side functions run on plain Python lists (used by pytest
goldens); ``match_counts_spark`` runs the same matcher distributed as a
grouped theta-join: gold and predicted co-grouped by normalized sentence
via ``applyInPandas`` — the per-group candidate sets are small, the
grouping key carries the join.
"""

from __future__ import annotations

import re
import string

# standard English stopword list (NLTK's, public domain) + punctuation —
# the reference uses nltk.corpus.stopwords which is unavailable here
_STOPWORDS = set(
    """i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself it
it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had having
do does did doing a an the and but if or because as until while of at by for
with about against between into through during before after above below to
from up down in out on off over under again further then once here there when
where why how all any both each few more most other some such no nor not only
own same so than too very s t can will just don don't should should've now d
ll m o re ve y ain aren aren't couldn couldn't didn didn't doesn doesn't hadn
hadn't hasn hasn't haven haven't isn isn't ma mightn mightn't mustn mustn't
needn needn't shan shan't shouldn shouldn't wasn wasn't weren weren't won
won't wouldn wouldn't""".split()
) | set(string.punctuation)

LEXICAL_THRESHOLD = 0.5  # matcher.py:108

# PTB bracket escapes (benchmark.py:162-167). Gold files from the
# supervised-oie corpus carry these; without unescaping, gold and predicted
# sentence keys never join and recall collapses.
PTB_ESCAPES = [
    ("(", "-LRB-"),
    (")", "-RRB-"),
    ("[", "-LSB-"),
    ("]", "-RSB-"),
    ("{", "-LCB-"),
    ("}", "-RCB-"),
]
_PUNCT_RE = re.compile("[%s]" % re.escape(string.punctuation))


def normalize_key(k: str) -> str:
    """benchmark.py:141-142 normalizeKey: strip spaces, PTB-unescape,
    strip punctuation — applied to BOTH gold and predicted sentence keys
    before matching (benchmark.py:58-59 normalizeDict)."""
    s = k.replace(" ", "")
    for u, e in PTB_ESCAPES:
        s = s.replace(e, u)
    return _PUNCT_RE.sub("", s)


def normalize_sent_col(col):
    """JVM-side normalize_key: same three steps as the Python version so the
    distributed matcher groups on identical keys (Java ``\\p{Punct}`` is
    exactly ``string.punctuation``)."""
    from pyspark.sql import functions as F

    c = F.replace(col, F.lit(" "), F.lit(""))
    for u, e in PTB_ESCAPES:
        c = F.replace(c, F.lit(e), F.lit(u))
    return F.regexp_replace(c, r"\p{Punct}", "")


def bow(rel: str, args: list[str]) -> str:
    return " ".join([rel] + list(args))


def _clean(words: list[str]) -> list[str]:
    return [w for w in words if w.lower() not in _STOPWORDS]


def lexical_match(gold_bow: str, pred_bow: str) -> bool:
    """matcher.py:84-109 with ignoreStopwords/ignoreCase (always on in the
    reference harness, benchmark.py:77-80)."""
    s_ref = _clean(gold_bow.lower().split(" "))
    s_ex = _clean(pred_bow.lower().split(" "))
    if not s_ref:
        return False
    count = 0
    for w1 in s_ref:
        for w2 in s_ex:
            if w1 == w2:
                count += 1
    return count / len(s_ref) > LEXICAL_THRESHOLD


def match_counts(
    gold: list[tuple[str, str, list[str]]],
    pred: list[tuple[str, str, list[str], float]],
):
    """Greedy per-sentence matching (benchmark.py:61-94).

    gold rows: (sent, rel, args); pred rows: (sent, rel, args, score).
    Returns (y_true, y_scores, correct_total, unmatched_count).
    """
    from collections import defaultdict

    gold_by_sent = defaultdict(list)
    for s, r, a in gold:
        gold_by_sent[normalize_key(s)].append((r, a))
    pred_by_sent = defaultdict(list)
    for s, r, a, sc in pred:
        pred_by_sent[normalize_key(s)].append([r, a, sc, False])  # matched flag

    y_true: list[int] = []
    y_scores: list[float] = []
    correct_total = 0
    unmatched = 0
    for sent, gold_exs in gold_by_sent.items():
        if sent not in pred_by_sent:
            # faithful quirk: the reference adds len(goldExtractions) per
            # gold extraction here (benchmark.py:63-66)
            for _ in gold_exs:
                unmatched += len(gold_exs)
                correct_total += len(gold_exs)
            continue
        preds = pred_by_sent[sent]
        for g_rel, g_args in gold_exs:
            correct_total += 1
            found = False
            for p in preds:
                if p[3]:
                    continue
                if lexical_match(bow(g_rel, g_args), bow(p[0], p[1])):
                    y_true.append(1)
                    y_scores.append(p[2])
                    p[3] = True
                    found = True
                    break
            if not found:
                unmatched += 1
        for p in preds:
            if not p[3]:
                y_true.append(0)
                y_scores.append(p[2])
    return y_true, y_scores, correct_total, unmatched


def pr_curve(y_true, y_scores, recall_multiplier: float):
    """PR points by descending score THRESHOLD + optimal F1 (benchmark.py:
    119-134, sklearn-free re-implementation of sklearn's
    ``precision_recall_curve`` semantics: one point per DISTINCT score, a
    threshold takes ALL predictions scoring >= it — tied scores are
    indivisible). Curve rows are (precision, recall, threshold) in
    descending-threshold order; recall carries the reference's
    unmatched-gold multiplier. Optimal is the max-F1 point (the reference
    maxes over the same threshold points)."""
    pairs = sorted(zip(y_scores, y_true), key=lambda t: -t[0])
    total_pos = sum(y_true)
    if total_pos == 0 or not pairs:
        return [], (0.0, 0.0, 0.0, 0.0)
    tp = 0
    curve = []
    best = (0.0, 0.0, 0.0, 0.0)
    n = 0
    i = 0
    while i < len(pairs):
        score = pairs[i][0]
        while i < len(pairs) and pairs[i][0] == score:  # the whole tie run
            tp += pairs[i][1]
            n += 1
            i += 1
        p = tp / n
        r = (tp / total_pos) * recall_multiplier
        f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
        curve.append((p, r, score))
        if f1 > best[2]:
            best = (p, r, f1, score)
    return curve, best


def pr_auc(curve) -> float:
    """Area under the PR curve by trapezoid over recall (the reference's
    ``auc(r, p)``, benchmark.py:102 — README's headline AUC column).
    ``curve`` is ``pr_curve``'s output (descending threshold = ascending
    recall); sklearn's appended (precision 1, recall 0) endpoint is the
    integration anchor. Flat-recall segments contribute zero, matching
    sklearn's truncation of the post-full-recall tail."""
    prev_p, prev_r = 1.0, 0.0
    area = 0.0
    for p, r, _ in curve:
        area += (r - prev_r) * (p + prev_p) / 2.0
        prev_p, prev_r = p, r
    return area


def precision_recall(gold, pred):
    """Headline P/R for the P/R>=0.95 gate: matched gold / |pred| and
    matched gold / |gold|."""
    y_true, _, correct_total, unmatched = match_counts(gold, pred)
    matched = sum(y_true)
    precision = matched / len(y_true) if y_true else 0.0
    recall = (correct_total - unmatched) / correct_total if correct_total else 0.0
    return precision, recall


def _normalize_sent(df):
    from pyspark.sql import functions as F

    return df.withColumn("sent", normalize_sent_col(F.col("sent")))


def match_counts_spark(gold_df, pred_df):
    """Distributed matcher: co-group by normalized sentence key, run the
    greedy matcher per group. gold_df: (sent, rel, args); pred_df:
    (sent, rel, args, score). Returns DataFrame (sent, n_gold, n_pred,
    n_matched); ``sent`` is the normalized key."""
    import pandas as pd

    def fn(key, gold_pdf: pd.DataFrame, pred_pdf: pd.DataFrame) -> pd.DataFrame:
        g = [(key[0], r, list(a)) for r, a in zip(gold_pdf["rel"], gold_pdf["args"])]
        p = [
            (key[0], r, list(a), float(s))
            for r, a, s in zip(pred_pdf["rel"], pred_pdf["args"], pred_pdf["score"])
        ]
        y_true, _, correct, _ = match_counts(g, p)
        return pd.DataFrame(
            [
                {
                    "sent": key[0],
                    "n_gold": len(g),
                    "n_pred": len(p),
                    "n_matched": int(sum(y_true)),
                }
            ]
        )

    gold_df, pred_df = _normalize_sent(gold_df), _normalize_sent(pred_df)
    return gold_df.groupBy("sent").cogroup(pred_df.groupBy("sent")).applyInPandas(
        fn, schema="sent string, n_gold long, n_pred long, n_matched long"
    )


def match_rows_spark(gold_df, pred_df):
    """Distributed matcher that keeps per-prediction (label, score) rows —
    everything the PR curve needs — plus one summary row per sentence group
    carrying the reference's quirky counters (correct_total includes the
    len(goldExtractions)-per-gold inflation for pred-less sentences,
    benchmark.py:63-66). Prediction rows have label/score set and zero
    counters; summary rows have null label/score.

    One cogroup shuffle on the normalized sentence key; nothing collects.
    """
    import pandas as pd

    def fn(key, gold_pdf: pd.DataFrame, pred_pdf: pd.DataFrame) -> pd.DataFrame:
        g = [(key[0], r, list(a)) for r, a in zip(gold_pdf["rel"], gold_pdf["args"])]
        p = [
            (key[0], r, list(a), float(s))
            for r, a, s in zip(pred_pdf["rel"], pred_pdf["args"], pred_pdf["score"])
        ]
        y_true, y_scores, correct, unmatched = match_counts(g, p)
        rows = [
            {"sent": key[0], "label": int(t), "score": float(s),
             "correct_total": 0, "unmatched": 0, "n_pred": 0}
            for t, s in zip(y_true, y_scores)
        ]
        rows.append(
            {"sent": key[0], "label": None, "score": None,
             "correct_total": correct, "unmatched": unmatched, "n_pred": len(p)}
        )
        return pd.DataFrame(rows)

    gold_df, pred_df = _normalize_sent(gold_df), _normalize_sent(pred_df)
    return gold_df.groupBy("sent").cogroup(pred_df.groupBy("sent")).applyInPandas(
        fn,
        schema=(
            "sent string, label int, score double, "
            "correct_total long, unmatched long, n_pred long"
        ),
    )


def evaluate_oie_spark(pred_df, gold_df) -> dict:
    """Distributed O30 evaluation: same numbers as the driver-side
    match_counts + pr_curve + pr_auc path, but nothing larger than a
    handful of scalars ever reaches the driver.

    The PR curve has exactly one point per DISTINCT score — sklearn's
    threshold semantics (a threshold takes every prediction scoring >= it),
    which is what the reference maxes F1 over and integrates into AUC
    (benchmark.py:101-134). So the curve scan is a window over the small
    distinct-score table, never a single-reducer pass over the full
    prediction set; AUC is the trapezoid over recall with sklearn's
    (precision 1, recall 0) anchor via a lag window over the same table.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    score_col = "contrastive_dis" if "contrastive_dis" in pred_df.columns else "score"
    sign = -1.0 if score_col == "contrastive_dis" else 1.0
    p = pred_df.select(
        F.col("sentence").alias("sent"),
        "rel",
        F.array("subj", "obj").alias("args"),
        (F.lit(sign) * F.col(score_col).cast("double")).alias("score"),
    )
    g = gold_df.select("sent", "rel", "args")
    rows = match_rows_spark(g, p).cache()
    try:
        agg = rows.agg(
            F.sum("correct_total").alias("total"),
            F.sum("unmatched").alias("unmatched"),
            F.sum("n_pred").alias("n_pred"),
            F.coalesce(F.sum("label"), F.lit(0)).alias("matched"),
            F.count("label").alias("n_scored"),
        ).collect()[0]
        total = int(agg["total"] or 0)
        unmatched = int(agg["unmatched"] or 0)
        matched = int(agg["matched"])
        n_scored = int(agg["n_scored"])
        precision = matched / n_scored if n_scored else 0.0
        mult = (total - unmatched) / total if total else 0.0
        recall = mult

        best_f1 = 0.0
        auc = 0.0
        n_points = 0
        if matched > 0:
            by_score = (
                rows.filter(F.col("label").isNotNull())
                .groupBy("score")
                .agg(F.count("*").alias("c"), F.sum("label").alias("m"))
            )
            w = Window.orderBy(F.desc("score")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            pts = by_score.select(
                "score",
                (F.sum("c").over(w)).alias("n"),
                (F.sum("m").over(w)).alias("tp"),
            ).select(
                "score",
                (F.col("tp") / F.col("n")).alias("prec"),
                ((F.col("tp") / F.lit(float(matched))) * mult).alias("rec"),
            )
            lagw = Window.orderBy(F.desc("score"))
            curve = pts.select(
                "prec", "rec",
                F.lag("prec", 1, 1.0).over(lagw).alias("prev_p"),
                F.lag("rec", 1, 0.0).over(lagw).alias("prev_r"),
            )
            row = curve.agg(
                F.max(
                    F.when(
                        F.col("prec") + F.col("rec") > 0,
                        2 * F.col("prec") * F.col("rec") / (F.col("prec") + F.col("rec")),
                    ).otherwise(0.0)
                ).alias("best_f1"),
                F.sum(
                    (F.col("rec") - F.col("prev_r"))
                    * (F.col("prec") + F.col("prev_p")) / 2.0
                ).alias("auc"),
                F.count("*").alias("n_points"),
            ).collect()[0]
            best_f1 = float(row["best_f1"] or 0.0)
            auc = float(row["auc"] or 0.0)
            n_points = int(row["n_points"])
        return {
            "precision": precision,
            "recall": recall,
            "optimal_f1": best_f1,
            "auc": auc,
            "auc_points": n_points,
            "n_gold": total,
            "n_pred": int(agg["n_pred"] or 0),
        }
    finally:
        rows.unpersist()
