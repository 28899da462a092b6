#!/usr/bin/env python3
"""DuckDB side of the differential fuzz gate (DifferentialFuzzSpec).

Reads a spec JSON {"sfDir": ..., "outDir": ..., "queries": [{"name","sql"}]},
executes each SQL against the parquet tables, and writes one file per query
(<outDir>/<name>.txt) holding the canonicalized result: one row per line,
values joined by '|', sorted lexicographically. The canonical form MUST stay
in lock-step with FuzzPlanGen.canon on the Scala side:
  null -> bare U+2205; float -> %.4f (with -0.0 normalized to 0.0) or the
  specials NaN / Inf / -Inf; int -> str; STRINGS are escaped so the
  row/field framing is binary-safe: backslash -> \\, newline -> \n,
  CR -> \r, '|' -> \p, U+2205 -> \0 (so a literal '∅' string can never
  collide with the bare null marker).
Dev-only tooling (like check.py) — never imported from shipped Scala code.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["nation", "customer", "orders", "lineitem"]


def esc(s):
    # lock-step with FuzzPlanGen.escapeString: backslash FIRST
    return (s.replace("\\", "\\\\").replace("\n", "\\n").replace("\r", "\\r")
             .replace("|", "\\p").replace("∅", "\\0"))


def fmt(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == 0.0:
            v = 0.0
        s = f"{v:.4f}"
        # negative-but-rounds-to-zero: keep in lock-step with the Scala
        # side's BigDecimal HALF_EVEN (which emits unsigned zero)
        return "0.0000" if s == "-0.0000" else s
    if isinstance(v, str):
        return esc(v)
    return str(v)


def main():
    spec = json.load(open(sys.argv[1]))
    os.makedirs(spec["outDir"], exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{spec['sfDir']}/{t}.parquet')")
    for q in spec["queries"]:
        try:
            rows = con.execute(q["sql"]).fetchall()
            lines = sorted("|".join(fmt(v) for v in r) for r in rows)
        except Exception as e:  # surface engine errors as comparable rows
            lines = ["ERROR: " + str(e).replace("\n", " ")]
        with open(os.path.join(spec["outDir"], q["name"] + ".txt"), "w") as f:
            f.write("\n".join(lines))


if __name__ == "__main__":
    main()
