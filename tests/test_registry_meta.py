"""Registry-wide fast guards: every queries() entry must ANALYZE on both
engines. Catches SQL syntax drift / renamed-column breakage in seconds,
without executing anything — the full value comparison is
tools/check_oracles.py (the driver's gate)."""

import duckdb
import pytest

from deepex_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_every_query_has_an_oracle():
    missing = [n for n, s in REGISTRY.items() if not s.oracle]
    assert not missing, f"rows-only queries (weaker driver check): {missing}"


def test_oracles_plan_on_duckdb(duck):
    bad = []
    for name, spec in REGISTRY.items():
        try:
            duck.execute("EXPLAIN " + spec.oracle)
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:120]))
    assert not bad, bad


def test_spark_builders_analyze(spark):
    # building the DataFrame runs Spark's analyzer (schema resolution)
    # without executing a job; golden-oracle builders also touch their
    # fixture parquet at this stage
    bad = []
    for name, spec in REGISTRY.items():
        try:
            spec.spark_fn(spark, SF_DIR).schema
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:120]))
    assert not bad, bad


def test_bench_suites_resolve_to_registered_queries():
    """Every name in bench.py's suite lists must be a registered query —
    a rename can't silently turn a bench arm into a KeyError at
    measurement time (the driver runs bench.py unattended)."""
    import bench
    from deepex_spark.queries import REGISTRY

    for suite in ("HEADLINE", "CURATION", "GRAPH", "ANN"):
        names = getattr(bench, suite, [])
        missing = [n for n in names if n not in REGISTRY]
        assert not missing, f"{suite}: {missing}"
