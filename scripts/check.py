#!/usr/bin/env python3
"""Dev-only cross-check mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Loads each <out>/<name> parquet (Spark result), runs the matching oracle SQL
from <out>/oracle_sql.json in DuckDB against the sf parquet tables, sorts
columns by name and rows by all columns, and diffs values exactly
(floats to 1e-9 relative). NOT shipped code — local validation tooling only.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = norm(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            duck_df = norm(con.sql(sql).df())
            if list(spark_df.columns) != list(duck_df.columns):
                raise AssertionError(
                    f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            if spark_df.shape != duck_df.shape:
                raise AssertionError(f"shape {spark_df.shape} vs {duck_df.shape}")
            pd.testing.assert_frame_equal(
                spark_df, duck_df, check_dtype=False, check_exact=False,
                rtol=1e-9, atol=1e-12)
            # strict: exact value equality like a hash compare would be
            strict = spark_df.astype(str).equals(duck_df.astype(str))
            print(f"PASS {name} rows={len(spark_df)}"
                  + ("" if strict else "  (WARN: not string-exact)"))
            n_pass += 1
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:400]
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
