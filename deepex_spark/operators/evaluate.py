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
        gold_by_sent[s].append((r, a))
    pred_by_sent = defaultdict(list)
    for s, r, a, sc in pred:
        pred_by_sent[s].append([r, a, sc, False])  # matched flag

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
    """PR pairs by descending score threshold + optimal F1 (benchmark.py:
    119-134, sklearn-free re-implementation)."""
    pairs = sorted(zip(y_scores, y_true), key=lambda t: -t[0])
    total_pos = sum(y_true)
    if total_pos == 0 or not pairs:
        return [], (0.0, 0.0, 0.0, 0.0)
    tp = 0
    curve = []
    best = (0.0, 0.0, 0.0, 0.0)
    for i, (score, label) in enumerate(pairs, 1):
        tp += label
        p = tp / i
        r = (tp / total_pos) * recall_multiplier
        f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
        curve.append((p, r, score))
        if f1 > best[2]:
            best = (p, r, f1, score)
    return curve, best


def precision_recall(gold, pred):
    """Headline P/R for the P/R>=0.95 gate: matched gold / |pred| and
    matched gold / |gold|."""
    y_true, _, correct_total, unmatched = match_counts(gold, pred)
    matched = sum(y_true)
    precision = matched / len(y_true) if y_true else 0.0
    recall = (correct_total - unmatched) / correct_total if correct_total else 0.0
    return precision, recall


def match_counts_spark(gold_df, pred_df):
    """Distributed matcher: co-group by sentence, run the greedy matcher per
    group. gold_df: (sent, rel, args); pred_df: (sent, rel, args, score).
    Returns DataFrame (sent, n_gold, n_pred, n_matched)."""
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

    return gold_df.groupBy("sent").cogroup(pred_df.groupBy("sent")).applyInPandas(
        fn, schema="sent string, n_gold long, n_pred long, n_matched long"
    )
