"""Regenerate the multimodal trio's golden oracle parquets.

The DXM1 synthetic container is seeded-deterministic and the three
registered multimodal queries ignore sf_dir entirely, so each oracle is an
unkeyed pinned parquet of the query's own output. Run after any intentional
change to the container format, decode stub, frame sampling, feature
hashing, or the LSH pair generation:

    python tools/make_multimodal_golden.py

Determinism is asserted by computing each result twice at different
partitionings.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens"
)

SPECS = {
    "multimodal_decode": ("multimodal_decode_golden.parquet", ["media_id"]),
    "multimodal_frames": ("multimodal_frames_golden.parquet", ["media_id", "frame_idx"]),
    "multimodal_feature_ann": ("multimodal_feature_ann_golden.parquet", ["id_a", "id_b"]),
}


def main():
    from deepex_spark.queries import REGISTRY
    from deepex_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (fname, sort_key) in SPECS.items():
        fn = REGISTRY[name].spark_fn
        pdf = fn(spark, "unused").toPandas()
        again = fn(spark, "unused").repartition(5).toPandas()
        a = pdf.sort_values(sort_key).reset_index(drop=True)
        b = again.sort_values(sort_key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        path = os.path.join(GOLDEN_DIR, fname)
        pdf.to_parquet(path, index=False)
        print(f"{name}: {len(pdf)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
