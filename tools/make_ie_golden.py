"""Regenerate the pipeline_triples / pipeline_candidates golden oracles.

The IE beam-search kernel is not SQL-expressible, so each query's DuckDB
oracle is a pinned parquet of the query's own (deterministic) output, one
slice per corpus, keyed by ``corpus_fp = md5(text of doc_id 0)`` — the same
scheme as the RC golden (tools/make_rc_golden.py). Run after any
intentional kernel/distill/rerank change:

    python tools/make_ie_golden.py [sf_dir ...]

Defaults to sf0.001 and sf0.01 (the driver's correctness gate runs at
sf0.01; local checks use sf0.001). Determinism is asserted by computing
each slice twice at different shuffle parallelism.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens"
)

SPECS = {
    "pipeline_triples": (
        "ie_triples_golden.parquet",
        ["docid", "subj", "rel", "obj", "rank"],
    ),
    "pipeline_candidates": (
        "ie_candidates_golden.parquet",
        ["docid", "sent_offset", "subj", "rel", "obj", "cand_rank"],
    ),
}


def main():
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    from deepex_spark.queries import REGISTRY
    from deepex_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    for name, (fname, sort_key) in SPECS.items():
        slices = []
        for sf_dir in sf_dirs:
            fp = duckdb.sql(
                f"SELECT md5(text) FROM '{sf_dir}/documents.parquet' WHERE doc_id = 0"
            ).fetchone()[0]
            fn = REGISTRY[name].spark_fn
            pdf = fn(spark, sf_dir).toPandas()
            again = fn(spark, sf_dir).repartition(3).toPandas()
            a = pdf.sort_values(sort_key).reset_index(drop=True)
            b = again.sort_values(sort_key).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b)
            pdf["corpus_fp"] = fp
            slices.append(pdf)
            print(f"{name} @ {sf_dir}: {len(pdf)} rows, fp={fp}")
        out = pd.concat(slices, ignore_index=True)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        path = os.path.join(GOLDEN_DIR, fname)
        out.to_parquet(path, index=False)
        print(f"wrote {len(out)} rows -> {path} ({os.path.getsize(path)//1024} KiB)")
    spark.stop()


if __name__ == "__main__":
    main()
