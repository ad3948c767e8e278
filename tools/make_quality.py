"""Pin the engine's QUALITY numbers the way bench pins throughput.

Runs the committed deterministic OIE fixture corpus (the same 25-doc
seeded corpus as ``tests/test_golden.py``) through the full pipeline and
the distributed evaluator (``tasks.evaluate_oie_task`` ->
``evaluate_oie_spark``), against the committed gold fixture
``tests/fixtures/quality_gold.json``, and writes the resulting
P / R / optimal-F1 / AUC row to ``BENCH/QUALITY.md``.
``tests/test_quality_pinned.py`` recomputes the same four numbers and
asserts them against the pinned row — a quality regression (kernel, dedup,
rerank, matcher or PR/AUC derivation drift) fails CI exactly like a
throughput regression would.

The gold fixture is DERIVED ONCE (``--regen-gold``) from the committed
golden triples with a deterministic md5-keyed perturbation — ~10% of
golden triples dropped (so some predictions go unmatched: precision < 1)
and 40 fabricated never-matching gold extractions added (unmatched gold:
recall < 1) — so all four metrics land strictly inside (0, 1) and move if
ANY stage shifts. With real HF weights the identical harness reproduces
the reference's published-table protocol (README.md:104-110); this pins
the fixture-corpus counterpart.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from hashlib import md5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(REPO, "tests", "fixtures", "golden_triples.json")
QUALITY_GOLD = os.path.join(REPO, "tests", "fixtures", "quality_gold.json")
QUALITY_MD = os.path.join(REPO, "BENCH", "QUALITY.md")

N_DOCS, SEED = 25, 7  # the committed fixture corpus (test_golden.py)
N_FABRICATED = 40


def regen_gold() -> None:
    with open(GOLDEN) as f:
        golden = json.load(f)
    rows = []
    for t in golden:
        key = f'{t["docid"]}|{t["subj"]}|{t["rel"]}|{t["obj"]}|{t["is_rev"]}'
        if int.from_bytes(md5(key.encode()).digest()[:4], "big") % 10 == 0:
            continue  # dropped gold -> its prediction scores as a FP
        rows.append({"sent": t["sentence"], "rel": t["rel"],
                     "args": [t["subj"], t["obj"]]})
    for i in range(N_FABRICATED):
        rows.append({
            "sent": f"Qzv unmatched gold sentence number {i}.",
            "rel": "qzv fabricated relation",
            "args": [f"Qzv Alpha {i}", f"Qzv Beta {i}"],
        })
    with open(QUALITY_GOLD, "w") as f:
        json.dump(rows, f, indent=0)
    print(f"wrote {QUALITY_GOLD}: {len(rows)} gold rows "
          f"({len(rows) - N_FABRICATED} kept of {len(golden)} golden + "
          f"{N_FABRICATED} fabricated)")


def compute_metrics(spark) -> dict:
    from deepex_spark.config import DeepExConfig
    from deepex_spark.pipeline import extract_triples
    from deepex_spark.sources.pages import PAGES_SCHEMA, synth_page_rows
    from deepex_spark.tasks import evaluate_oie_task

    cfg = DeepExConfig.task(dist_const=2)
    pages = spark.createDataFrame(
        synth_page_rows(n_docs=N_DOCS, seed=SEED), PAGES_SCHEMA
    ).repartition(4)
    pred = extract_triples(pages, cfg)
    with open(QUALITY_GOLD) as f:
        gold_rows = [(g["sent"], g["rel"], list(g["args"])) for g in json.load(f)]
    gold = spark.createDataFrame(gold_rows, "sent string, rel string, args array<string>")
    return evaluate_oie_task(pred, gold)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen-gold", action="store_true",
                    help="re-derive quality_gold.json from golden_triples.json")
    args = ap.parse_args()
    if args.regen_gold:
        regen_gold()

    from deepex_spark.session import build_session

    spark = build_session("quality", master="local[8]", shuffle_partitions=8)
    m = compute_metrics(spark)
    with open(QUALITY_MD, "w") as f:
        f.write(
            "# QUALITY — pinned fixture-corpus evaluation (regression gate)\n\n"
            "Produced by `python tools/make_quality.py`; asserted (to 1e-9)\n"
            "by `tests/test_quality_pinned.py`. Corpus: the committed 25-doc\n"
            f"seeded synthetic fixture (seed={SEED}); gold: "
            "`tests/fixtures/quality_gold.json`\n"
            "(md5-perturbed golden triples — see tools/make_quality.py\n"
            "docstring). Same protocol as the reference's README table\n"
            "(benchmark.py P/R/F1 + AUC); with real HF weights the harness\n"
            "reproduces the published-table setting unchanged.\n\n"
            "| precision | recall | optimal_f1 | auc | n_gold | n_pred |\n"
            "|---|---|---|---|---|---|\n"
            f"| {m['precision']:.12f} | {m['recall']:.12f} "
            f"| {m['optimal_f1']:.12f} | {m['auc']:.12f} "
            f"| {m['n_gold']} | {m['n_pred']} |\n"
        )
    print(json.dumps(m))
    print(f"wrote {QUALITY_MD}")


if __name__ == "__main__":
    main()
