#!/usr/bin/env python3
"""Dev-only cross-check mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Driver-faithful compare (the round-7 lesson): the driver reads the SPARK
result straight off parquet — decimals stay decimal128 with their declared
scale (trailing zeros kept) — while its ORACLE side comes through a DuckDB
dataframe, which coerces DECIMAL to float64. Reading BOTH sides through
DuckDB (the old shortcut here) coerces identically and silently hides that
skew: six round-7 queries passed this script and failed the driver. So:

  - Spark side: pyarrow reads the parquet (decimal128 -> decimal.Decimal,
    exact, scale preserved).
  - Oracle side: DuckDB .df() (DECIMAL -> float64), as the driver does.
  - Both frames are canonically stringified per value and must match
    EXACTLY after the driver's column-name sort + row sort. A
    decimal-vs-float trailing-zero skew ("1.000000" vs "1.0") is a FAIL.

A tolerance compare (rtol 1e-9) still runs first so a failure is labeled
"representation skew" vs "wrong values". NOT shipped code — local tooling.
"""
import datetime
import decimal
import glob
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    """One canonical string per value; Decimal keeps its declared scale
    (that asymmetry vs float is exactly what the driver's hash sees)."""
    if v is None:
        return "NULL"
    if v is pd.NaT:
        # must precede the Timestamp/datetime branches: NaTType subclasses
        # datetime, and .isoformat() would stringify as 'NaT' (surfaced by
        # AdversarialDataSpec's null-timestamp rows in q31's day column)
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "NULL"
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat() + " 00:00:00"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT:
        return "NULL"
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver order: columns sorted by name, every value stringified, rows
    sorted by all columns."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame(
        {c: [canon_value(v) for v in df[c]] for c in df.columns})
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out.reset_index(drop=True)


def spark_parquet(out_dir: str, name: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise AssertionError(f"no parquet under {out_dir}/{name}")
    frames = [pq.read_table(f).to_pandas(date_as_object=True)
              for f in files]
    return pd.concat(frames, ignore_index=True)


def tolerant_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    """Numeric-tolerance compare (both sides coerced) — distinguishes
    representation skew from genuinely wrong values."""
    try:
        an = a.reindex(sorted(a.columns), axis=1)
        bn = b.reindex(sorted(b.columns), axis=1)

        def coerce(v):
            # per-VALUE (not row-0 sniff): a leading NULL or a mixed
            # column must not skip the conversion, and None must survive
            # (astype(float) would raise on it)
            if isinstance(v, decimal.Decimal):
                return float(v)
            if isinstance(v, datetime.date) and not isinstance(
                    v, datetime.datetime):
                # pyarrow date objects vs DuckDB datetime64
                return pd.Timestamp(v)
            return v
        for df in (an, bn):
            for c in df.columns:
                if df[c].dtype == object:
                    df[c] = df[c].map(coerce)
        an = an.sort_values(by=list(an.columns), ignore_index=True)
        bn = bn.sort_values(by=list(bn.columns), ignore_index=True)
        pd.testing.assert_frame_equal(
            an, bn, check_dtype=False, check_exact=False,
            rtol=1e-9, atol=1e-12)
        return True
    except Exception:
        return False


def first_diff(a: pd.DataFrame, b: pd.DataFrame) -> str:
    for c in a.columns:
        neq = a[c].values != b[c].values
        if neq.any():
            i = int(np.argmax(neq))
            return f"col={c} row={i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
    return "?"


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
            spark_raw = spark_parquet(out_dir, name)
            duck_raw = con.sql(sql).df()  # DECIMAL -> float64, like driver
            spark_df = canon(spark_raw)
            duck_df = canon(duck_raw)
            if list(spark_df.columns) != list(duck_df.columns):
                raise AssertionError(
                    f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            if spark_df.shape != duck_df.shape:
                raise AssertionError(f"shape {spark_df.shape} vs {duck_df.shape}")
            if not spark_df.equals(duck_df):
                kind = ("REPRESENTATION skew (values equal under tolerance)"
                        if tolerant_equal(spark_raw, duck_raw)
                        else "VALUE mismatch")
                raise AssertionError(f"{kind}; {first_diff(spark_df, duck_df)}")
            print(f"PASS {name} rows={len(spark_df)}")
            n_pass += 1
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:400]
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
