"""Regenerate the pipeline_rc_triples golden oracle table.

The RC beam kernel is not SQL-expressible, so its DuckDB oracle is a pinned
parquet of the query's own (deterministic) output, one slice per corpus,
keyed by ``corpus_fp = md5(text of doc_id 0)``. Run after any intentional
kernel/rerank change:

    python tools/make_rc_golden.py [sf_dir ...]

Defaults to sf0.001 and sf0.01 (the driver's correctness gate runs at
sf0.01; local checks use sf0.001). Determinism is asserted by computing the
slice twice at different shuffle parallelism.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "goldens", "rc_triples_golden.parquet",
)


def main():
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    from deepex_spark.queries import pipeline_rc_triples
    from deepex_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    slices = []
    for sf_dir in sf_dirs:
        fp = duckdb.sql(
            f"SELECT md5(text) FROM '{sf_dir}/documents.parquet' WHERE doc_id = 0"
        ).fetchone()[0]
        pdf = pipeline_rc_triples(spark, sf_dir).toPandas()
        again = pipeline_rc_triples(
            spark.sparkSession if hasattr(spark, "sparkSession") else spark, sf_dir
        ).repartition(3).toPandas()
        key = ["docid", "subj", "rel", "obj", "rank"]
        a = pdf.sort_values(key).reset_index(drop=True)
        b = again.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        pdf["corpus_fp"] = fp
        slices.append(pdf)
        print(f"{sf_dir}: {len(pdf)} rows, fp={fp}")
    out = pd.concat(slices, ignore_index=True)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    out.to_parquet(GOLDEN, index=False)
    print(f"wrote {len(out)} rows -> {GOLDEN}")
    spark.stop()


if __name__ == "__main__":
    main()
