#!/usr/bin/env python3
"""Testdata-vintage fingerprint (round-16 follow-through; dev-only,
like check.py).

Round 16's adjudication found that the driver regenerates
/root/testdata every round, so bench_history columns taken in
different rounds compare timings on DIFFERENT physical datasets — a
1.1–1.3x "drift" can be entirely a data constant (row-group layout,
grid sizes) with zero code change, and only an old-code/same-data A/B
can attribute it. This script makes that ambiguity mechanically
visible: it fingerprints an SF dir (sha256 over every parquet file's
bytes, order-independent) so each bench column can carry the vintage
it was measured on.

Usage:
  data_vintage.py [SF_DIR]            -> print the fingerprint
  data_vintage.py --stamp COL [SF_DIR] -> record it under
      bench_history.json "vintages"[COL] (idempotent overwrite)

gate_sweep.py reads the stamps: a sweep whose endpoints carry
DIFFERENT vintages is annotated so a past-gate entry is read as
"includes a data constant — A/B before calling it code drift", and a
SAME-vintage sweep is certified as a true code-vs-code comparison.
"""
import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SF = "/root/testdata/sf0.1"


def fingerprint(sf_dir):
    files = sorted(f for f in os.listdir(sf_dir) if f.endswith(".parquet"))
    if not files:
        raise SystemExit(f"error: no parquet files in {sf_dir}")
    h = hashlib.sha256()
    total = 0
    for f in files:
        p = os.path.join(sf_dir, f)
        h.update(f.encode())
        with open(p, "rb") as fh:
            while chunk := fh.read(1 << 20):
                h.update(chunk)
        total += os.path.getsize(p)
    return {"sf_dir": sf_dir, "files": len(files), "bytes": total,
            "sha256": h.hexdigest()}


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--stamp":
        if len(args) not in (2, 3):
            print("usage: data_vintage.py --stamp COL [SF_DIR]",
                  file=sys.stderr)
            return 2
        col, sf_dir = args[1], args[2] if len(args) == 3 else DEFAULT_SF
        fp = fingerprint(sf_dir)
        hist_path = os.path.join(ROOT, "bench_history.json")
        h = json.load(open(hist_path))
        h.setdefault("vintages", {})[col] = fp
        json.dump(h, open(hist_path, "w"), indent=1)
        print(f"stamped {col}: {fp['sha256'][:16]} "
              f"({fp['files']} files, {fp['bytes']} bytes)")
        return 0
    if len(args) > 1:
        print("usage: data_vintage.py [SF_DIR] | --stamp COL [SF_DIR]",
              file=sys.stderr)
        return 2
    fp = fingerprint(args[0] if args else DEFAULT_SF)
    print(json.dumps(fp, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
