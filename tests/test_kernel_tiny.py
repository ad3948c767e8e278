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


def test_kernel_tiny2_spark_matches_independent_sql(spark):
    """Variant 2 (dist_const=2, beam_size=3, search_max_len=6): the same
    independent-SQL protocol at knobs meaningfully closer to the
    production config — exercises the multi-pair enumeration order and
    3-way beam prunes."""
    from deepex_spark.kernel.tiny_oracle import kernel_tiny_oracle_sql
    from deepex_spark.queries import REGISTRY

    sql = kernel_tiny_oracle_sql(variant=2)
    assert "goldens" not in sql

    got = {
        (int(r["sent_id"]), int(r["seq_rank"]), r["path_str"], float(r["score"]))
        for r in REGISTRY["kernel_tiny2_sql"].spark_fn(spark, "unused").collect()
    }
    want = {
        (int(a), int(b), c, float(d)) for a, b, c, d in duckdb.sql(sql).fetchall()
    }
    assert got, "fixture produced no sequences"
    assert got == want


def test_kernel_tiny2_exercises_distance_2_pairs(spark):
    """Every variant-2 fixture sentence has a 3+-entity segment, so walks
    whose (start, bound) are 2 apart exist — re-derived from the committed
    segments table, not trusted from the generator. And the longer
    max_len must be exercised: paths of length 5 or 6 appear."""
    import os

    import duckdb as dk

    from deepex_spark.kernel.tiny_oracle import FIXTURE_DIR2
    from deepex_spark.queries import REGISTRY

    segs = os.path.join(FIXTURE_DIR2, "segments.parquet")
    n3 = dk.sql(
        f"""SELECT count(DISTINCT sent_id) FROM (
              SELECT sent_id, seg_id FROM read_parquet('{segs}')
              GROUP BY sent_id, seg_id HAVING count(*) >= 3)"""
    ).fetchone()[0]
    assert n3 == 50  # EVERY sentence has a 3+-entity segment

    rows = REGISTRY["kernel_tiny2_sql"].spark_fn(spark, "unused").collect()
    lens = {len(r["path_str"].split("-")) for r in rows}
    assert {3, 4, 5} <= lens, lens


def test_kernel_tiny3_spark_matches_independent_sql(spark):
    """Variant 3 (dist_const=3, beam_size=4, search_max_len=8): 4-way
    hop/beam prunes, distance-3 bound enumeration, longest SQL-checkable
    survivors — exact float equality against the DuckDB re-derivation."""
    from deepex_spark.kernel.tiny_oracle import kernel_tiny_oracle_sql
    from deepex_spark.queries import REGISTRY

    sql = kernel_tiny_oracle_sql(variant=3)
    assert "goldens" not in sql

    got = {
        (int(r["sent_id"]), int(r["seq_rank"]), r["path_str"], float(r["score"]))
        for r in REGISTRY["kernel_tiny3_sql"].spark_fn(spark, "unused").collect()
    }
    want = {
        (int(a), int(b), c, float(d)) for a, b, c, d in duckdb.sql(sql).fetchall()
    }
    assert got, "fixture produced no sequences"
    assert got == want


def test_kernel_tiny3_exercises_distance_3_pairs(spark):
    """Every variant-3 fixture sentence has a 4+-entity segment (so
    distance-3 bounds exist), and the longer max_len is really used:
    paths up to length 7 appear."""
    import os

    import duckdb as dk

    from deepex_spark.kernel.tiny_oracle import FIXTURE_DIR3
    from deepex_spark.queries import REGISTRY

    segs = os.path.join(FIXTURE_DIR3, "segments.parquet")
    n4 = dk.sql(
        f"""SELECT count(DISTINCT sent_id) FROM (
              SELECT sent_id, seg_id FROM read_parquet('{segs}')
              GROUP BY sent_id, seg_id HAVING count(*) >= 4)"""
    ).fetchone()[0]
    assert n4 == 50  # EVERY sentence has a 4+-entity segment

    rows = REGISTRY["kernel_tiny3_sql"].spark_fn(spark, "unused").collect()
    lens = {len(r["path_str"].split("-")) for r in rows}
    assert {3, 4, 5, 6} <= lens, lens


def test_kernel_tiny4_spark_matches_independent_sql(spark):
    """Variant 4 (dist_const=3, beam_size=6, search_max_len=8): the beam
    width at its PRODUCTION value (DeepExConfig.task/small both use 6) —
    exact float equality against the DuckDB re-derivation."""
    from deepex_spark.kernel.tiny_oracle import kernel_tiny_oracle_sql
    from deepex_spark.queries import REGISTRY

    sql = kernel_tiny_oracle_sql(variant=4)
    assert "goldens" not in sql

    got = {
        (int(r["sent_id"]), int(r["seq_rank"]), r["path_str"], float(r["score"]))
        for r in REGISTRY["kernel_tiny4_sql"].spark_fn(spark, "unused").collect()
    }
    want = {
        (int(a), int(b), c, float(d)) for a, b, c, d in duckdb.sql(sql).fetchall()
    }
    assert got, "fixture produced no sequences"
    assert got == want


def test_kernel_tiny4_wider_beam_admits_more_sequences(spark):
    """Beam 6 over the same selection gate as variant 3 must admit MORE
    survivors than beam 4 (otherwise the wider prune was never binding),
    and the production beam width matches the task config."""
    from deepex_spark.config import DeepExConfig
    from deepex_spark.kernel.tiny_oracle import VARIANTS
    from deepex_spark.queries import REGISTRY

    assert VARIANTS[4][0]["beam_size"] == DeepExConfig.task().beam_size == 6

    n4 = REGISTRY["kernel_tiny4_sql"].spark_fn(spark, "unused").count()
    n3 = REGISTRY["kernel_tiny3_sql"].spark_fn(spark, "unused").count()
    assert n4 > n3, (n4, n3)
