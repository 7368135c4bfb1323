"""Diff two bench.py JSON outputs: per-query deltas, regressions first.

Usage:  python tools/bench_compare.py OLD.json NEW.json [threshold_pct]

Reads the one-line JSON each run emits (or a driver BENCH_r{N}.json whose
"parsed" field holds it), prints queries whose time moved more than
``threshold_pct`` (default 30%) in either direction plus adds/removes, and
the suite totals. Exit code 0 always — this is a report, not a gate.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]  # driver BENCH_r{N}.json wrapper
    return d


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"suite total: {old.get('value')}s -> {new.get('value')}s "
          f"({len(oq)} -> {len(nq)} queries)")
    moved = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0:
            continue
        pct = 100.0 * (b - a) / a
        if abs(pct) >= thr and abs(b - a) >= 0.3:  # ignore sub-noise moves
            moved.append((pct, name, a, b))
    for pct, name, a, b in sorted(moved, reverse=True):
        print(f"  {pct:+7.1f}%  {name:34s} {a:6.2f}s -> {b:6.2f}s")
    for name in sorted(set(nq) - set(oq)):
        print(f"  [new]     {name:34s}          -> {nq[name]:6.2f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"  [removed] {name:34s} {oq[name]:6.2f}s")
    if not moved:
        print(f"  no common query moved more than {thr:.0f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
