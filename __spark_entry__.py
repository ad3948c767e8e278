"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship DeepEx-style triple-extraction pipeline
over the sf0.001 documents table; ``queries()`` exposes every implemented
operator from SURVEY.md §2 (plus training-data-pipeline ops); ``oracle_sql()``
gives the DuckDB-checkable ANSI SQL for each SQL-expressible query. The
beam-search kernel queries are registered without an oracle (rows-only
check) and are pinned by pytest goldens + a single-node local oracle
instead (tests/test_parity.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the driver's cwd
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: documents -> ranked
    (subj, rel, obj) triples via the full pipeline (normalize -> sentencize
    -> fused beam-search kernel -> distill -> contrastive rerank)."""
    from deepex_spark.queries import pipeline_triples

    return pipeline_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from deepex_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from deepex_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
