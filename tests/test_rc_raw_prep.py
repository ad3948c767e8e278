"""O29 raw-file RC dataset preparation: FewRel val_wiki.json + pid2name,
TACRED test.json, and the 16-dev-relation candidate filter
(reference scripts/rc/dataset_preparation.py:38-104)."""

import json

import pytest

VAL_WIKI = {
    "P26": [
        {
            "tokens": ["Obama", "married", "Michelle", "in", "Chicago"],
            "h": ["obama", "Q76", [[0]]],
            "t": ["michelle", "Q13133", [[2]]],
        },
        {
            "tokens": ["Curie", "wed", "Pierre", "in", "Paris"],
            "h": ["curie", "Q7186", [[0]]],
            "t": ["pierre", "Q37463", [[2]]],
        },
    ],
    "P361": [
        {
            "tokens": ["The", "engine", "is", "part", "of", "the", "car"],
            "h": ["engine", "Q44167", [[1]]],
            "t": ["car", "Q1420", [[6]]],
        }
    ],
}
PID2NAME = {"P26": ["spouse", "spouse of"], "P361": ["part of", "component"]}

TACRED = [
    {
        "token": ["Smith", "works", "for", "Acme", "Corp"],
        "subj_start": 0, "subj_end": 0, "obj_start": 3, "obj_end": 4,
        "relation": "per:employee_of",
    },
    {
        "token": ["The", "firm", "hired", "Jones", "yesterday"],
        "subj_start": 3, "subj_end": 3, "obj_start": 1, "obj_end": 1,
        "relation": "org:employees",
    },
]


@pytest.fixture()
def fewrel_files(tmp_path):
    vw = tmp_path / "val_wiki.json"
    vw.write_text(json.dumps(VAL_WIKI))
    p2n = tmp_path / "pid2name.json"
    p2n.write_text(json.dumps(PID2NAME))
    return str(vw), str(p2n)


def test_prepare_fewrel_raw(spark, fewrel_files):
    from deepex_spark.operators.rc import prepare_fewrel_raw

    df = prepare_fewrel_raw(spark, *fewrel_files)
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == ["0", "1", "2"]  # sequential, insertion order
    assert rows["0"]["tokens"] == VAL_WIKI["P26"][0]["tokens"]
    assert rows["0"]["subject_spans"] == [[0]]
    assert rows["0"]["object_spans"] == [[2]]
    assert rows["0"]["true_relation"] == "spouse"   # pid2name[pid][0]
    assert rows["2"]["true_relation"] == "part of"


def test_prepare_tacred_raw(spark, tmp_path):
    from deepex_spark.operators.rc import prepare_tacred_raw

    tj = tmp_path / "test.json"
    tj.write_text(json.dumps(TACRED))
    df = prepare_tacred_raw(spark, str(tj))
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == ["0", "1"]
    # inclusive token-index ranges, reference dataset_preparation.py:80-81
    assert rows["0"]["subject_spans"] == [[0]]
    assert rows["0"]["object_spans"] == [[3, 4]]
    assert rows["0"]["tokens"] == TACRED[0]["token"]
    assert rows["1"]["true_relation"] == "org:employees"


def test_dev_relation_filter(spark, fewrel_files):
    """Candidates keep only dev-set relations; emptied candidates drop
    (dataset_preparation.py:61-68)."""
    from deepex_spark.operators.rc import prepare_fewrel_raw, prepare_rc_dataset

    raw = prepare_fewrel_raw(spark, *fewrel_files)
    lem = {"marry": ["spouse", "sibling"], "part of": ["part of"],
           "work for": ["employer"]}
    unlem = {"married": ["spouse", "sibling"], "part of": ["part of"],
             "works for": ["employer"]}
    rc = prepare_rc_dataset(raw, lem, unlem, dev_relations=["spouse", "part of"])
    by_id = {r["id"]: r["rel_candidates"] for r in rc.collect()}
    rels_0 = [list(c["relation"]) for c in by_id["0"]]
    # 'sibling' pruned (not a dev relation), 'spouse' kept
    assert rels_0 and all(set(r) == {"spouse"} for r in rels_0)
    # doc 2's 'part of' candidate survives intact
    rels_2 = [list(c["relation"]) for c in by_id["2"]]
    assert any("part of" in r for r in rels_2)


def test_fewrel_raw_through_rc_task(spark, fewrel_files):
    """End-to-end: raw val_wiki.json -> run_rc_task metrics."""
    from deepex_spark.config import DeepExConfig
    from deepex_spark.operators.rc import (
        FEWREL_DEV_RELATIONS,
        prepare_fewrel_raw,
    )
    from deepex_spark.tasks import run_rc_task

    assert len(FEWREL_DEV_RELATIONS) == 16
    raw = prepare_fewrel_raw(spark, *fewrel_files)
    metrics = run_rc_task(
        raw,
        lem_aliases={"marry": ["spouse"], "part of": ["part of"]},
        unlem_aliases={"married": ["spouse"], "wed": ["spouse"],
                       "part of": ["part of"]},
        alias2rel={"married": ["spouse"], "wed": ["spouse"],
                   "part of": ["part of"]},
        cfg=DeepExConfig.task(dist_const=2, beam_mode="RC"),
        topk=1,
    )
    assert metrics["n_gold"] == 3
    assert metrics["recall"] > 0
