"""jobs/mine_rules.py — AMIE-style rule mining wired into the CONSTRUCT
batch materializer (the knowledge-base-completion loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# shops 101-103, cities 11-12, countries 1-2; in_country is the
# composition located_in ∘ city_in with shop 103's head MISSING (the
# KB-completion gap), contains_shop the inverse of located_in with
# shop 102's edge missing.
_FACTS = [
    (101, 11, "located_in"),
    (102, 11, "located_in"),
    (103, 12, "located_in"),
    (11, 1, "city_in"),
    (12, 2, "city_in"),
    (101, 1, "in_country"),
    (102, 1, "in_country"),
    (11, 101, "contains_shop"),
    (12, 103, "contains_shop"),
]


def _edges(spark):
    return spark.createDataFrame(_FACTS, "src long, dst long, rel string")


def test_mine_rule_set_selects_and_orders(spark):
    """Thresholds: the chain rule qualifies at PCA 1.0 / CWA 2/3 (the
    gap is completable), the partial inverse at 2/3, and the REVERSE
    inverse (contains_shop ⇒ located_in, CWA 1.0) is skipped — a rule
    the KG already satisfies everywhere infers nothing."""
    from jobs.mine_rules import mine_rule_set

    rules, stats = mine_rule_set(
        _edges(spark), min_support=2, min_pca_conf=0.6
    )
    assert rules == [
        "CONSTRUCT { ?x <in_country> ?y } WHERE { ?x <located_in> ?z ."
        " ?z <city_in> ?y . FILTER(?x != ?y) }",
        "CONSTRUCT { ?y <contains_shop> ?x } WHERE {"
        " ?x <located_in> ?y . }",
    ]
    chain, inv = stats
    assert (chain["kind"], chain["support"], chain["confidence"],
            chain["pca_confidence"]) == ("chain", 2, 0.666667, 1.0)
    assert (inv["kind"], inv["support"], inv["confidence"]) == (
        "inverse", 2, 0.666667)
    # a complete rule (CWA 1.0) must not be re-fired
    assert not any("?y <located_in> ?x" in r for r in rules)


def test_quote_refuses_unroundtrippable_predicate():
    from jobs.mine_rules import _quote, chain_rule_text

    assert _quote("a b") == "<a b>"
    with pytest.raises(ValueError):
        chain_rule_text("ok", "bad>pred", "ok")


def _kg_catalog(spark, tmp_path):
    from deepex_spark.operators.graph import build_edges, with_edge_bucket
    from deepex_spark.plans.catalog import Catalog

    trips = spark.createDataFrame(
        [(s, o, r, 0.9, f"doc{i:02d}") for i, (s, o, r) in enumerate(_FACTS)],
        "subj_id long, obj_id long, pred_canon string, score double,"
        " docid string",
    ).withColumn("pred_id", F.xxhash64("pred_canon"))
    cat = Catalog(str(tmp_path / "kg"))
    cat.write_snapshot(
        with_edge_bucket(build_edges(trips, run_id="base")),
        "edges", partition_by=["bucket"], run_id="base",
    )
    return cat


def test_mine_rules_job_end_to_end(spark, tmp_path, capsys):
    """CLI: mine over the published snapshot, write the rules file, and
    forward-chain the batch — the two gap edges appear, already-known
    heads don't duplicate, and the publish is idempotent per run_id."""
    from deepex_spark.plans.catalog import Catalog
    from jobs.mine_rules import main

    cat = _kg_catalog(spark, tmp_path)
    rules_path = str(tmp_path / "rules.sparql")
    main([
        "--catalog", str(tmp_path / "kg"),
        "--min-support", "2", "--min-pca-conf", "0.6",
        "--rules-out", rules_path,
        "--materialize", "kbc1",
    ])
    out = capsys.readouterr().out
    assert "2 rules" in out

    cur = cat.read(spark, "edges")
    assert cur.count() == len(_FACTS) + 2
    inferred = {
        (r.subj_id, r.pred_canon, r.obj_id)
        for r in cur.where(F.col("n_docs") == 0).collect()
    }
    assert inferred == {(103, "in_country", 2), (11, "contains_shop", 102)}
    # per-rule lineage: chain rule is batch index 0, inverse index 1
    tags = {
        r.pred_canon: r.sample_docid
        for r in cur.where(F.col("n_docs") == 0).collect()
    }
    assert tags == {"in_country": "sparql:kbc1#0",
                    "contains_shop": "sparql:kbc1#1"}

    v1 = Catalog(str(tmp_path / "kg")).version_of_run("edges", "kbc1")
    main([
        "--catalog", str(tmp_path / "kg"),
        "--min-support", "2", "--min-pca-conf", "0.6",
        "--materialize", "kbc1",
    ])
    assert cat.version_of_run("edges", "kbc1") == v1
    assert cat.read(spark, "edges").count() == len(_FACTS) + 2

    with open(rules_path) as f:
        blocks = [b for b in f.read().split("\n\n") if b.strip()]
    assert len(blocks) == 2 and all("CONSTRUCT" in b for b in blocks)
