"""RC-mode kernel + Spark pipeline tests."""

import pytest

from deepex_spark.config import DeepExConfig
from deepex_spark.kernel.rc_kernel import (
    beam_search_rc,
    featurize_rc,
    process_rc_record,
    rc_mentions,
)
from deepex_spark.nlp.attention import get_attention_provider

CFG = DeepExConfig.task(dist_const=2, beam_mode="RC")

RECORD = {
    "tokens": ["Obama", "was", "born", "in", "Hawaii"],
    "subject_spans": [[0]],
    "object_spans": [[4]],
    "rel_candidates": [
        {"aliase": "born in", "relation": ["P19"], "len": 2, "char_span": [10, 17]}
    ],
}


def test_rc_mentions_merge_and_relation_words():
    m = rc_mentions(RECORD)
    assert m["text"] == "Obama was born in Hawaii"
    assert m["head"] == [([0, 0], "Obama", [0, 5])]
    assert m["tail"] == [([4, 4], "Hawaii", [18, 24])]
    # relation candidate char span [10,17] covers 'born in'
    assert m["relation"][0][1] == "born in"
    assert m["relation"][0][2] == [10, 17]


def test_rc_mentions_multitoken_subject():
    rec = {
        "tokens": ["Barack", "Obama", "visited", "Paris"],
        "subject_spans": [[0, 1]],
        "object_spans": [[3]],
        "rel_candidates": [],
    }
    m = rc_mentions(rec)
    assert m["head"] == [([0, 1], "Barack Obama", [0, 12])]


def test_rc_extraction_end_to_end_kernel():
    rows = process_rc_record("42", RECORD, CFG, get_attention_provider(CFG))
    assert rows
    top = rows[0]
    assert top["subj"] == "Obama" and top["obj"] == "Hawaii"
    assert top["rel"] == "born in"  # relation mention surface text
    assert (top["subj_s"], top["subj_e"]) == (0, 5) and (top["obj_s"], top["obj_e"]) == (18, 24)
    # the RC beam's reversed walk swaps endpoints back (kgm.py:499), so it
    # lands on the SAME oriented key and dedups into freq >= 2; reversed
    # triples are emitted at distill, not here
    keys = {r["triple_key"] for r in rows}
    assert keys == {"Obama [SEP] born in [SEP] Hawaii"}
    assert top["freq"] >= 2


def test_rc_exhaustive_subspan_scoring():
    import numpy as np

    feat = featurize_rc("1", 0, RECORD, CFG)
    # tokens: [CLS] Obama was born in Hawaii [SEP]
    att = np.full((7, 7), 0.01)
    att[1, 2] = 0.9   # Obama -> was (not a relation token)
    att[1, 3] = 0.8   # Obama -> born
    att[4, 5] = 0.9   # in -> Hawaii
    att[3, 4] = 0.7   # born -> in
    seqs = beam_search_rc(att, feat, CFG)
    assert seqs
    best_path = list(seqs[0][0])
    # best chain h=1 .. relation span [3,4] .. t=5
    assert best_path[0] == 1 and best_path[-1] == 5
    assert best_path[1:-1] == [3, 4]


def test_rc_eval_acceptance_rules(spark):
    """The reference's TACRED/FewRel acceptance quirks (evaluation.py:
    82-141): colon-split+underscore normalization of the gold label, the
    no_relation convention for unknown predicted surfaces, and the FewRel
    'main subject' -> 'part of' alias."""
    from deepex_spark.operators.rc import evaluate_rc

    triples = spark.createDataFrame(
        [
            ("1", "founded by", 0.1, 1),   # TACRED org:founded_by, normalized
            ("2", "gibberish", 0.1, 1),    # unknown surface + no_relation gold
            ("3", "of", 0.1, 1),           # FewRel main subject -> part of
            ("4", "works at", 0.1, 1),     # wrong relation
            # item 5 emits nothing
        ],
        "docid string, rel string, contrastive_dis double, rank int",
    )
    gold = spark.createDataFrame(
        [
            ("1", "org:founded_by"),
            ("2", "no_relation"),
            ("3", "main subject"),
            ("4", "per:spouse"),
            ("5", "per:age"),
        ],
        "id string, true_relation string",
    )
    alias2rel = {
        "founded by": ["founded by"],
        "of": ["part of"],
        "works at": ["employee of"],
    }
    m = evaluate_rc(triples, gold, alias2rel, topk=1)
    assert m["n_gold"] == 5
    assert m["n_predicted"] == 4  # item 5 produced no prediction
    assert m["n_correct"] == 3    # items 1 (normalized), 2 (no_relation), 3 (quirk)
    assert m["precision"] == 3 / 4 and m["recall"] == 3 / 5


def test_rc_eval_per_item_alias_map(spark):
    """Reference semantics (evaluation.py:95-101): acceptance consults each
    item's OWN alias->relations map, not a corpus-global dictionary. Pin
    the case where they differ: the same surface maps to different relation
    sets in two items — the global dict (a set-union across items) accepts
    both, the per-item map accepts only the item whose own candidates carry
    the gold relation."""
    from deepex_spark.operators.rc import evaluate_rc

    triples = spark.createDataFrame(
        [
            ("1", "of", 0.1, 1),
            ("2", "of", 0.1, 1),
            ("3", "unknown surface", 0.1, 1),  # not in item 3's candidates
        ],
        "docid string, rel string, contrastive_dis double, rank int",
    )
    gold = spark.createDataFrame(
        [("1", "part of"), ("2", "part of"), ("3", "no_relation")],
        "id string, true_relation string",
    )
    cand_ddl = (
        "id string, rel_candidates array<struct<aliase:string,"
        "relation:array<string>,len:int,char_span:array<int>>>"
    )
    items = spark.createDataFrame(
        [
            ("1", [("of", ["part of"], 1, [0, 2])]),
            ("2", [("of", ["member of"], 1, [0, 2])]),
            ("3", [("in", ["located in"], 1, [0, 2])]),
        ],
        cand_ddl,
    )
    per_item = evaluate_rc(triples, gold, topk=1, items=items)
    # item 1: own map has the gold; item 2: own map does NOT (member of);
    # item 3: surface unknown to ITS map + gold no_relation -> correct
    assert per_item["n_correct"] == 2
    assert per_item["n_predicted"] == 3 and per_item["n_gold"] == 3

    # the global-dict fallback unions the two items' maps and (wrongly,
    # vs reference semantics) also accepts item 2
    global_dict = evaluate_rc(
        triples, gold,
        {"of": ["part of", "member of"], "in": ["located in"]},
        topk=1,
    )
    assert global_dict["n_correct"] == 3

    import pytest as _pytest

    with _pytest.raises(ValueError):
        evaluate_rc(triples, gold)  # neither map given
    with _pytest.raises(ValueError):
        evaluate_rc(triples, gold, {"of": ["part of"]}, topk=1, items=items)


def test_rc_spark_pipeline_and_eval(spark):
    from deepex_spark.operators.rc import (
        RC_INPUT_DDL,
        evaluate_rc,
        prepare_rc_dataset,
        rc_pipeline,
    )

    raw = spark.createDataFrame(
        [
            ("1", ["Obama", "was", "born", "in", "Hawaii"], [[0]], [[4]], "P19"),
            ("2", ["Curie", "works", "at", "the", "institute"], [[0]], [[4]], "P108"),
            ("3", ["Turing", "was", "born", "in", "London"], [[0]], [[4]], "P19"),
        ],
        RC_INPUT_DDL,
    )
    lem = {"bear in": ["P19"], "work at": ["P108"]}
    unlem = {"born in": ["P19"], "works at": ["P108"]}
    rc_df = prepare_rc_dataset(raw, lem, unlem)
    cands = rc_df.collect()
    assert all(len(r["rel_candidates"]) >= 1 for r in cands)

    cfg = DeepExConfig.task(dist_const=2, beam_mode="RC")
    triples = rc_pipeline(rc_df, cfg)
    alias2rel = {"born in": ["P19"], "works at": ["P108"]}
    gold = raw.select("id", "true_relation")
    metrics = evaluate_rc(triples, gold, alias2rel, topk=1)
    assert metrics["n_gold"] == 3
    assert metrics["recall"] >= 2 / 3  # relation surface is the alias here
    assert 0 <= metrics["precision"] <= 1
