"""jobs/query_kg.py — SPARQL-lite over a published catalog snapshot."""

from __future__ import annotations

import pytest

EDGES = [
    ("paris", "capital_of", "france"),
    ("berlin", "capital_of", "germany"),
    ("france", "member_of", "eu"),
    ("germany", "member_of", "eu"),
    ("oslo", "capital_of", "norway"),
]


def _edges_df(spark):
    return spark.createDataFrame(
        EDGES, "subj_id string, pred_canon string, obj_id string"
    )


def _catalog(spark, tmp_path):
    from deepex_spark.plans.catalog import Catalog

    cat = Catalog(str(tmp_path / "kg"))
    cat.write(_edges_df(spark), "edges")
    return cat


def test_run_query_over_catalog(spark, tmp_path):
    from jobs.query_kg import run_query

    cat = _catalog(spark, tmp_path)
    out = run_query(
        spark, cat,
        "SELECT ?cap ?country WHERE {"
        " ?cap <capital_of> ?country . ?country <member_of> <eu> . }",
    )
    assert sorted(map(tuple, out.collect())) == [
        ("berlin", "germany"), ("paris", "france"),
    ]


def test_run_query_reads_current_snapshot(spark, tmp_path):
    """A snapshot-versioned edges table must be served at its published
    version — the maintain_kg publish path and this job agree."""
    from deepex_spark.plans.catalog import Catalog
    from jobs.query_kg import run_query

    cat = Catalog(str(tmp_path / "kg"))
    cat.write_snapshot(_edges_df(spark), "edges", run_id="v1")
    extra = spark.createDataFrame(
        EDGES + [("brussels", "capital_of", "belgium"),
                 ("belgium", "member_of", "eu")],
        "subj_id string, pred_canon string, obj_id string",
    )
    cat.write_snapshot(extra, "edges", run_id="v2")
    out = run_query(
        spark, cat,
        "SELECT ?cap WHERE {"
        " ?cap <capital_of> ?c . ?c <member_of> <eu> . }",
    )
    assert sorted(r["cap"] for r in out.collect()) == [
        "berlin", "brussels", "paris",
    ]


def test_main_writes_parquet(spark, tmp_path, capsys):
    from jobs.query_kg import main

    _catalog(spark, tmp_path)
    outdir = str(tmp_path / "answers")
    main([
        "--catalog", str(tmp_path / "kg"),
        "--query",
        "SELECT ?c (COUNT(?cap) AS ?n) WHERE { ?cap <capital_of> ?x ."
        " ?x <member_of> ?c . } ORDER BY ?c LIMIT 10",
        "--output", outdir,
        "--show", "5",
    ])
    got = spark.read.parquet(outdir).collect()
    assert [(r["c"], r["n"]) for r in got] == [("eu", 2)]
    assert "eu\t2" in capsys.readouterr().out


def test_main_rejects_bad_cols(tmp_path):
    from jobs.query_kg import main

    with pytest.raises(SystemExit):
        main([
            "--catalog", str(tmp_path / "kg"),
            "--query", "SELECT ?a WHERE { ?a <r> ?b . }",
            "--cols", "just_two,columns",
        ])


def test_run_query_construct_form(spark, tmp_path):
    """CONSTRUCT through the job: derived edges come back in the
    snapshot's own (subj_id, pred_canon, obj_id) schema."""
    from jobs.query_kg import run_query

    cat = _catalog(spark, tmp_path)
    out = run_query(
        spark, cat,
        "CONSTRUCT { ?cap <eu_capital> <eu> . } WHERE {"
        " ?cap <capital_of> ?c . ?c <member_of> <eu> . }",
    )
    assert out.columns == ["subj_id", "pred_canon", "obj_id"]
    assert sorted(map(tuple, out.collect())) == [
        ("berlin", "eu_capital", "eu"), ("paris", "eu_capital", "eu"),
    ]


def test_run_query_ask_form(spark, tmp_path):
    from jobs.query_kg import run_query

    cat = _catalog(spark, tmp_path)
    assert run_query(
        spark, cat, "ASK { ?x <capital_of> <norway> . }"
    ).collect()[0]["ask"] is True
    assert run_query(
        spark, cat, "ASK { ?x <capital_of> <atlantis> . }"
    ).collect()[0]["ask"] is False
