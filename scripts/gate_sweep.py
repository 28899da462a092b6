#!/usr/bin/env python3
"""Exhaustive bench regression-gate sweep (round-14 judge ask #1: two
past-gate entries slipped through a hand adjudication — make the sweep
scripted and provably exhaustive over every shared query).

Usage: gate_sweep.py [BASE_COL] [NEW_COL]   (defaults: the two newest
r*_local columns in bench_history.json)

Applies the engine's own regression gate — ratio > 1.4x AND delta >
+0.3 s — to EVERY query shared by the two columns and prints one line
per past-gate entry plus a summary naming the sweep size, so an
adjudication can cite "swept N, M past gate" instead of a prior.
Dev-only tooling, like check.py.
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATIO, DELTA = 1.4, 0.3


def main() -> int:
    hist = json.load(open(os.path.join(ROOT, "bench_history.json")))
    queries = hist["queries"]
    cols = sorted(
        {c for v in queries.values() for c in v if re.fullmatch(r"r\d+b?_local", c)},
        key=lambda c: (int(re.match(r"r(\d+)", c).group(1)), c))
    base, new = (sys.argv[1], sys.argv[2]) if len(sys.argv) == 3 else cols[-2:]
    shared = [q for q, v in queries.items() if base in v and new in v]
    past = []
    for q in sorted(shared):
        b, n = queries[q][base], queries[q][new]
        if b > 0 and n / b > RATIO and n - b > DELTA:
            past.append((q, b, n, n / b))
    for q, b, n, r in sorted(past, key=lambda t: -t[3]):
        print(f"PAST-GATE {q}: {base}={b:.3f}s {new}={n:.3f}s ({r:.2f}x, +{n-b:.2f}s)")
    print(f"== swept {len(shared)} shared queries {base} -> {new}: "
          f"{len(past)} past the {RATIO}x/+{DELTA}s gate")
    return 0


if __name__ == "__main__":
    sys.exit(main())
