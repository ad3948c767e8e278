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


def _stat_edges_catalog(spark, tmp_path):
    """A snapshot-published edge table in the FULL statistics schema
    (operators/graph.py::build_edges + bucket layout) — what build_kg /
    maintain_kg actually publish, which materialize_construct merges into."""
    from pyspark.sql import functions as F
    from deepex_spark.operators.graph import build_edges, with_edge_bucket
    from deepex_spark.plans.catalog import Catalog

    trips = spark.createDataFrame(
        [
            (1, 2, "parent_of", 0.9, "doc01"),
            (2, 3, "parent_of", 0.8, "doc02"),
            (1, 2, "parent_of", 0.7, "doc03"),
            (4, 5, "likes", 0.5, "doc04"),
        ],
        "subj_id long, obj_id long, pred_canon string, score double, docid string",
    ).withColumn("pred_id", F.xxhash64("pred_canon"))
    cat = Catalog(str(tmp_path / "kg"))
    cat.write_snapshot(
        with_edge_bucket(build_edges(trips, run_id="base")),
        "edges", partition_by=["bucket"], run_id="base",
    )
    return cat


def test_materialize_construct_merges_idempotently(spark, tmp_path):
    """CONSTRUCT --materialize: derived triples fold into the edge
    snapshot carrying ONE unit of rule evidence and ZERO document
    statistics, pred_id follows the canonical xxhash64(pred_canon) rule,
    doc-backed stats stay untouched, a retried run_id is a no-op, and a
    re-firing under a new run_id adds evidence like any delta."""
    from pyspark.sql import functions as F
    from jobs.query_kg import materialize_construct

    cat = _stat_edges_catalog(spark, tmp_path)
    rule = ("CONSTRUCT { ?a <grandparent_of> ?c . } WHERE {"
            " ?a <parent_of> ?b . ?b <parent_of> ?c . }")
    v1, n1 = materialize_construct(spark, cat, rule, run_id="rule1")
    cur = cat.read(spark, "edges")
    derived = cur.where(F.col("pred_canon") == "grandparent_of").collect()
    assert [(r.subj_id, r.obj_id) for r in derived] == [(1, 3)]
    d = derived[0]
    assert (d.n_evidence, d.n_docs, d.max_score, d.sum_score) == (1, 0, 0.0, 0.0)
    assert d.sample_docid == "sparql:rule1"
    assert d.pred_id == spark.range(1).select(
        F.xxhash64(F.lit("grandparent_of"))).first()[0]
    pe = cur.where(
        (F.col("pred_canon") == "parent_of") & (F.col("subj_id") == 1)).first()
    assert (pe.n_evidence, pe.n_docs, pe.sample_docid) == (2, 2, "doc01")
    v2, n2 = materialize_construct(spark, cat, rule, run_id="rule1")
    assert (v2, n2) == (v1, n1)
    materialize_construct(spark, cat, rule, run_id="rule2")
    d2 = cat.read(spark, "edges").where(
        F.col("pred_canon") == "grandparent_of").first()
    assert (d2.n_evidence, d2.n_docs) == (2, 0)


def test_main_materialize_flag(spark, tmp_path, capsys):
    """--materialize wires the CONSTRUCT write path through the CLI and
    refuses non-CONSTRUCT queries."""
    import pytest
    from pyspark.sql import functions as F
    from deepex_spark.plans.catalog import Catalog
    from jobs.query_kg import main

    cat = _stat_edges_catalog(spark, tmp_path)
    main([
        "--catalog", str(tmp_path / "kg"),
        "--query",
        "CONSTRUCT { ?a <grandparent_of> ?c . } WHERE {"
        " ?a <parent_of> ?b . ?b <parent_of> ?c . }",
        "--materialize", "rule1",
    ])
    assert "published edges v2: 4 edges" in capsys.readouterr().out
    assert cat.read(spark, "edges").where(
        F.col("pred_canon") == "grandparent_of").count() == 1
    with pytest.raises(SystemExit):
        main([
            "--catalog", str(tmp_path / "kg"),
            "--query", "SELECT ?a WHERE { ?a <parent_of> ?b . }",
            "--materialize", "nope",
        ])


def test_run_query_describe_form(spark, tmp_path):
    """DESCRIBE through the job: the 1-hop neighborhood of a WHERE-bound
    node set, in the snapshot's own column mapping."""
    from jobs.query_kg import run_query

    cat = _catalog(spark, tmp_path)
    out = run_query(
        spark, cat,
        "DESCRIBE ?cap WHERE { ?cap <capital_of> <france> . }",
    )
    assert out.columns == ["subj_id", "pred_canon", "obj_id"]
    assert sorted(map(tuple, out.collect())) == [
        ("paris", "capital_of", "france"),
    ]


def test_with_labels_appends_canonicals(spark, tmp_path):
    """--resolve-labels: entity-id output columns get a <col>_label with
    the vertex canonical; predicate vars and aggregates untouched; ids
    missing from the vertex table label as NULL."""
    from pyspark.sql import functions as F
    from deepex_spark.plans.catalog import Catalog
    from jobs.query_kg import run_query, with_labels

    cat = Catalog(str(tmp_path / "kg"))
    cat.write(spark.createDataFrame(
        [(1, "capital_of", 2), (2, "member_of", 3), (9, "member_of", 3)],
        "subj_id long, pred_canon string, obj_id long"), "edges")
    cat.write(spark.createDataFrame(
        [(1, "Paris", 1, 1), (2, "France", 2, 3), (3, "EU", 2, 2)],
        "entity_id long, canonical string, n_docs long, n_mentions long"),
        "vertices")
    q = ("SELECT ?cap ?r ?c WHERE { ?cap ?r ?c . ?c <member_of> ?u . }")
    out = run_query(spark, cat, q)
    labeled = with_labels(spark, cat, out, q)
    assert labeled.columns == ["cap", "cap_label", "r", "c", "c_label"]
    rows = sorted(map(tuple, labeled.collect()))
    assert rows == [(1, "Paris", "capital_of", 2, "France")]
    # ASK is a no-op for label resolution
    ask = run_query(spark, cat, "ASK { ?x <member_of> ?y . }")
    assert with_labels(spark, cat, ask, "ASK { ?x <member_of> ?y . }"
                       ).columns == ["ask"]
    # id 9 has no vertex row -> NULL label, row kept
    q2 = "SELECT ?s WHERE { ?s <member_of> ?u . }"
    lab2 = with_labels(spark, cat, run_query(spark, cat, q2), q2)
    got = sorted(((r["s"], r["s_label"]) for r in lab2.collect()),
                 key=lambda t: t[0])
    assert got == [(2, "France"), (9, None)]


def test_main_resolve_labels_flag(spark, tmp_path, capsys):
    from deepex_spark.plans.catalog import Catalog
    from jobs.query_kg import main

    cat = Catalog(str(tmp_path / "kg"))
    cat.write(spark.createDataFrame(
        [(1, "capital_of", 2)], "subj_id long, pred_canon string, obj_id long"),
        "edges")
    cat.write(spark.createDataFrame(
        [(1, "Paris", 1, 1), (2, "France", 1, 1)],
        "entity_id long, canonical string, n_docs long, n_mentions long"),
        "vertices")
    main([
        "--catalog", str(tmp_path / "kg"),
        "--query", "SELECT ?a ?b WHERE { ?a <capital_of> ?b . }",
        "--resolve-labels", "--show", "5",
    ])
    assert "1\tParis\t2\tFrance" in capsys.readouterr().out


def test_materialize_rules_batch_one_publish(spark, tmp_path):
    """A rule BATCH compiles every rule against the SAME input snapshot
    (order-independent single stratum), pays one merge and one publish,
    tags per-rule lineage, and is idempotent per run_id."""
    from pyspark.sql import functions as F
    from jobs.query_kg import materialize_rules

    cat = _stat_edges_catalog(spark, tmp_path)
    rules = [
        "CONSTRUCT { ?a <grandparent_of> ?c . } WHERE {"
        " ?a <parent_of> ?b . ?b <parent_of> ?c . }",
        "CONSTRUCT { ?b <child_of> ?a . } WHERE { ?a <parent_of> ?b . }",
    ]
    v1, n1 = materialize_rules(spark, cat, rules, run_id="batch1")
    cur = cat.read(spark, "edges")
    gp = cur.where(F.col("pred_canon") == "grandparent_of").collect()
    ch = cur.where(F.col("pred_canon") == "child_of").collect()
    assert [(r.subj_id, r.obj_id) for r in gp] == [(1, 3)]
    assert sorted((r.subj_id, r.obj_id) for r in ch) == [(2, 1), (3, 2)]
    # per-rule lineage tags survive the shared publish
    assert gp[0].sample_docid == "sparql:batch1#0"
    assert {r.sample_docid for r in ch} == {"sparql:batch1#1"}
    # ONE publish: exactly one new snapshot version
    assert cat.version_of_run("edges", "batch1") == v1
    # single stratum: rule 2 did NOT see rule 1's output (no child_of
    # derived from grandparent edges, no grandparent from child edges)
    assert cur.where(F.col("pred_canon") == "grandparent_of").count() == 1
    # idempotent retry
    v2, n2 = materialize_rules(spark, cat, rules, run_id="batch1")
    assert (v2, n2) == (v1, n1)


def test_main_rules_file(spark, tmp_path, capsys):
    from pyspark.sql import functions as F
    from deepex_spark.plans.catalog import Catalog
    from jobs.query_kg import main

    cat = _stat_edges_catalog(spark, tmp_path)
    rf = tmp_path / "rules.sparql"
    rf.write_text(
        "# derive grandparents\n"
        "CONSTRUCT { ?a <grandparent_of> ?c . } WHERE {\n"
        "  ?a <parent_of> ?b . ?b <parent_of> ?c . }\n"
        "\n"
        "# inverse edges\n"
        "CONSTRUCT { ?b <child_of> ?a . } WHERE { ?a <parent_of> ?b . }\n"
    )
    main([
        "--catalog", str(tmp_path / "kg"),
        "--rules-file", str(rf),
        "--materialize", "batch1",
    ])
    assert "(2 rules)" in capsys.readouterr().out
    assert cat.read(spark, "edges").where(
        F.col("pred_canon").isin("grandparent_of", "child_of")).count() == 3
    with pytest.raises(SystemExit):
        main(["--catalog", str(tmp_path / "kg"), "--rules-file", str(rf)])
    with pytest.raises(SystemExit):
        main(["--catalog", str(tmp_path / "kg")])


def test_at_version_point_in_time(spark, tmp_path, capsys):
    """--at-version pins a historical snapshot: the rule-derived edge is
    visible at the current version, absent at the pre-materialization
    one, and the flag is refused for write paths."""
    import pytest
    from deepex_spark.plans.catalog import Catalog
    from jobs.query_kg import main, materialize_construct, run_query

    cat = _stat_edges_catalog(spark, tmp_path)
    base_v = cat.version_of_run("edges", "base")
    rule = ("CONSTRUCT { ?a <grandparent_of> ?c . } WHERE {"
            " ?a <parent_of> ?b . ?b <parent_of> ?c . }")
    materialize_construct(spark, cat, rule, run_id="rule1")

    ask = "ASK { ?a <grandparent_of> ?c . }"
    assert run_query(spark, cat, ask).collect()[0]["ask"] is True
    assert run_query(
        spark, cat, ask, at_version=base_v
    ).collect()[0]["ask"] is False

    main([
        "--catalog", str(tmp_path / "kg"),
        "--query", ask, "--at-version", str(base_v), "--show", "1",
    ])
    assert "False" in capsys.readouterr().out

    with pytest.raises(SystemExit):
        main([
            "--catalog", str(tmp_path / "kg"),
            "--query", rule, "--materialize", "r2",
            "--at-version", str(base_v),
        ])
