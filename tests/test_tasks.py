"""Task-level entry points (manager.py stage-chain parity)."""

from deepex_spark.config import DeepExConfig

LINES = [
    ("1", "Barack Obama was born in Hawaii."),
    ("2", "Marie Curie (the chemist) studied in Paris."),
    ("3", "The committee approved the budget."),
]


def test_oie_task_end_to_end(spark):
    from deepex_spark.tasks import (
        evaluate_oie_task,
        prepare_oie_corpus,
        run_oie_task,
        to_eval_tsv,
    )

    lines = spark.createDataFrame(LINES, "id string, text string")
    docs = prepare_oie_corpus(lines)
    got = {r["url"]: r["text"] for r in docs.collect()}
    assert set(got) == {"0" * 39 + "1", "0" * 39 + "2", "0" * 39 + "3"}
    # char swap applied at ingest (manager.py:26)
    assert "(" not in got["0" * 39 + "2"]
    assert len(got["0" * 39 + "2"]) == len(LINES[1][1])

    cfg = DeepExConfig.task(dist_const=2)
    top = run_oie_task(docs, "OIE_2016", cfg)
    rows = top.collect()
    assert rows
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["docid"], []).append(r["rank"])
    for ranks in per_doc.values():
        assert len(ranks) <= 3  # OIE_2016 keeps top-3 per sentence

    tsv = to_eval_tsv(top, docs).collect()
    assert tsv
    sample = tsv[0]["line"].split("\t")
    assert len(sample) == 5 and sample[1].startswith('"')

    # self-evaluation against own output as gold: P/R = 1
    gold_rows = [(r["sentence"], r["rel"], [r["subj"], r["obj"]]) for r in rows]
    gold = spark.createDataFrame(gold_rows, "sent string, rel string, args array<string>")
    metrics = evaluate_oie_task(top, gold)
    assert metrics["recall"] == 1.0
    assert metrics["optimal_f1"] > 0.9
    # the reference's second headline column: AUC must be reported and,
    # self-evaluating against own output, near-perfect
    assert metrics["auc"] > 0.9


def test_rc_task_end_to_end(spark):
    from deepex_spark.operators.rc import RC_INPUT_DDL
    from deepex_spark.tasks import run_rc_task

    raw = spark.createDataFrame(
        [
            ("1", ["Obama", "was", "born", "in", "Hawaii"], [[0]], [[4]], "P19"),
            ("2", ["Curie", "works", "at", "the", "institute"], [[0]], [[4]], "P108"),
        ],
        RC_INPUT_DDL,
    )
    metrics = run_rc_task(
        raw,
        lem_aliases={"bear in": ["P19"], "work at": ["P108"]},
        unlem_aliases={"born in": ["P19"], "works at": ["P108"]},
        alias2rel={"born in": ["P19"], "works at": ["P108"]},
        cfg=DeepExConfig.task(dist_const=2, beam_mode="RC"),
        topk=1,
    )
    assert metrics["n_gold"] == 2
    assert metrics["recall"] >= 0.5


def test_corpus_dedup_and_threshold_filter(spark):
    from deepex_spark.functions.sentencize import sentencize
    from deepex_spark.operators.distill import (
        corpus_dedup,
        distill_triples,
        threshold_filter,
    )
    from deepex_spark.operators.extract import extract_candidates
    from deepex_spark.pipeline import normalize_pages
    from deepex_spark.sources.pages import synth_pages

    cfg = DeepExConfig.task(dist_const=2)
    pages = synth_pages(spark, n_docs=6, seed=13)
    cands = extract_candidates(sentencize(normalize_pages(pages, cfg)), cfg)
    agg = corpus_dedup(cands, cfg).collect()
    assert agg
    # aggregated freq >= any single sentence's freq; ranked descending
    scores = [r["rank_score"] for r in agg]
    assert scores == sorted(scores, reverse=True)
    total_freq = sum(r["freq"] for r in agg)
    assert total_freq == cands.groupBy().sum("freq").collect()[0][0]

    tri = distill_triples(cands, cfg)
    kept = threshold_filter(tri, score_thres=0.005, len_thres=2)
    assert kept.count() < tri.count()  # relations longer than 2 words dropped
    assert kept.filter("size(split(rel, ' ')) > 2").count() == 0
