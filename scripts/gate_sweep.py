#!/usr/bin/env python3
"""Exhaustive bench regression-gate sweep (round-14 judge ask #1: two
past-gate entries slipped through a hand adjudication — make the sweep
scripted and provably exhaustive over every shared query).

Usage: gate_sweep.py [BASE_COL NEW_COL]

With explicit columns: one sweep BASE_COL -> NEW_COL.
With no args: sweeps the newest r*_local column against BOTH
  1. the adjacent column (one hop), and
  2. the column one further back (two hops) when it exists —
the round-15 judge's finding: adjacent-only sweeps let CHAINED
opposite-direction environmental adjudications mask slow creep ("r14
was a slower host" then "r15's host is back to r13 vintage" both pass,
while r13 -> r15 on same-vintage hosts shows real drift). The two-hop
sweep compares same-vintage endpoints directly so that cannot hide.

Applies the engine's own regression gate — ratio > 1.4x AND delta >
+0.3 s — to EVERY query shared by the two columns and prints one line
per past-gate entry plus a summary naming the sweep size, so an
adjudication can cite "swept N, M past gate" instead of a prior.

Each sweep is annotated with the endpoints' testdata vintage (stamped
by data_vintage.py into bench_history "vintages") — the round-16
finding: the driver regenerates /root/testdata every round, so
cross-round columns compare different physical datasets and a flagged
ratio can be a pure data constant. SAME-vintage endpoints certify a
true code-vs-code read; DIFFERENT/unstamped endpoints direct the
adjudicator to the old-code/same-data A/B protocol (COVERAGE.md
round-16) before any code-drift call.
Dev-only tooling, like check.py.
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATIO, DELTA = 1.4, 0.3


def vintage_note(vintages, base, new):
    """Round-16 lesson: columns measured on different driver-regenerated
    testdata carry a data constant — annotate every sweep with whether
    its endpoints are same-vintage (true code-vs-code) or not."""
    b, n = vintages.get(base), vintages.get(new)
    if b is None or n is None:
        missing = [c for c, v in ((base, b), (new, n)) if v is None]
        return (f"   (vintage: unstamped column(s) {', '.join(missing)} — "
                f"pre-r16; cross-round ratios may include a data constant)")
    if b["sha256"] == n["sha256"]:
        return (f"   (vintage: SAME testdata {b['sha256'][:12]} — past-gate "
                f"entries here are true code-vs-code drift)")
    return (f"   (vintage: DIFFERENT testdata {b['sha256'][:12]} -> "
            f"{n['sha256'][:12]} — ratios include a data constant; run the "
            f"old-code/same-data A/B before calling any entry code drift)")


def sweep(queries, base, new, vintages=None):
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
    if vintages is not None:
        print(vintage_note(vintages, base, new))


def main() -> int:
    if len(sys.argv) not in (1, 3):
        print("usage: gate_sweep.py [BASE_COL NEW_COL]   "
              "(no args: one-hop AND two-hop sweep of the newest column)",
              file=sys.stderr)
        return 2
    hist = json.load(open(os.path.join(ROOT, "bench_history.json")))
    queries = hist["queries"]
    vintages = hist.get("vintages", {})
    cols = sorted(
        {c for v in queries.values() for c in v if re.fullmatch(r"r\d+b?_local", c)},
        key=lambda c: (int(re.match(r"r(\d+)", c).group(1)), c))
    if len(sys.argv) == 3:
        base, new = sys.argv[1], sys.argv[2]
        known = {c for v in queries.values() for c in v}
        missing = [c for c in (base, new) if c not in known]
        if missing:
            print(f"error: column(s) not in bench_history.json: "
                  f"{', '.join(missing)} (have: {', '.join(cols)})",
                  file=sys.stderr)
            return 2
        sweep(queries, base, new, vintages)
        return 0
    if len(cols) < 2:
        print(f"error: need >= 2 r*_local columns in bench_history.json to "
              f"sweep (found: {', '.join(cols) or 'none'})", file=sys.stderr)
        return 2
    sweep(queries, cols[-2], cols[-1], vintages)
    if len(cols) >= 3:
        print("-- two-hop sweep (same-vintage drift check):")
        sweep(queries, cols[-3], cols[-1], vintages)
    return 0


if __name__ == "__main__":
    sys.exit(main())
