"""kernel_tiny_sql: the beam-search kernel verified against an
INDEPENDENT DuckDB re-derivation (no goldens, no engine output) at the
tiny configuration where the search is SQL-expressible."""

import duckdb


def test_kernel_tiny_spark_matches_independent_sql(spark):
    from deepex_spark.kernel.tiny_oracle import kernel_tiny_oracle_sql
    from deepex_spark.queries import REGISTRY

    sql = kernel_tiny_oracle_sql()
    # the whole point: the oracle must not read any pinned engine output
    assert "goldens" not in sql

    got = {
        (int(r["sent_id"]), int(r["seq_rank"]), r["path_str"], float(r["score"]))
        for r in REGISTRY["kernel_tiny_sql"].spark_fn(spark, "unused").collect()
    }
    want = {
        (int(a), int(b), c, float(d)) for a, b, c, d in duckdb.sql(sql).fetchall()
    }
    assert got, "fixture produced no sequences"
    # exact equality INCLUDING float scores — same IEEE op sequence on
    # both sides, so no tolerance is needed or used
    assert got == want


def test_kernel_tiny_covers_nontrivial_paths(spark):
    """The fixture must actually exercise the interesting rules: paths of
    length 3 AND 4 (multi-hop expansion, pruning pressure) and walks in
    both directions exist."""
    from deepex_spark.queries import REGISTRY

    rows = REGISTRY["kernel_tiny_sql"].spark_fn(spark, "unused").collect()
    lens = {len(r["path_str"].split("-")) for r in rows}
    assert {3, 4} <= lens, lens
    n_sents = {r["sent_id"] for r in rows}
    assert len(n_sents) >= 40  # broad coverage across the 50-sentence slice
