"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from deepex_spark.queries import REGISTRY
    from deepex_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            n = spec.spark_fn(spark, sf_dir).count()
            print(f"{name}: rows-only, {n} rows")
            continue
        try:
            s_pdf = spec.spark_fn(spark, sf_dir).toPandas()
            d_pdf = con.execute(spec.oracle).fetchdf()
            a, b = normalize(s_pdf), normalize(d_pdf)
            if list(a.columns) != list(b.columns):
                failures.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
                print(f"{name}: FAIL cols {list(a.columns)} vs {list(b.columns)}")
                continue
            if len(a) != len(b):
                failures.append((name, f"rows {len(a)} vs {len(b)}"))
                print(f"{name}: FAIL rows {len(a)} vs {len(b)}")
                continue
            if not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                ndiff = int(diff.any(axis=1).sum())
                failures.append((name, f"{ndiff} differing rows"))
                print(f"{name}: FAIL {ndiff}/{len(a)} differing rows")
                bad = diff.any(axis=1)
                print("  spark:", a[bad].head(3).to_dict("records"))
                print("  duck :", b[bad].head(3).to_dict("records"))
            else:
                print(f"{name}: OK ({len(a)} rows)")
        except Exception as e:
            failures.append((name, str(e)[:300]))
            print(f"{name}: ERROR {str(e)[:300]}")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("\nall oracle checks passed")


if __name__ == "__main__":
    main()
