"""Diff two bench.py JSON outputs: per-query deltas, regressions first.

Usage:  python tools/bench_compare.py OLD.json NEW.json [threshold_pct]

Reads the one-line JSON each run emits (or a driver BENCH_r{N}.json whose
"parsed" field holds it), prints queries whose time moved more than
``threshold_pct`` (default 30%) in either direction plus adds/removes, and
the suite totals. Exit code 0 always — this is a report, not a gate.

Calibration (round 9, VERDICT r8 item 3): when BOTH runs carry
``calibration_sec`` (the fixed xxhash64 reference job bench.py times,
min-of-3), every per-query value is divided by its run's calibration
before comparing, so the reported ratios are in host-speed-normalized
units and round-over-round claims survive the 1.3-1.8x shared-host drift
BASELINE.md documents. The raw seconds are still printed alongside.
Standing rule: round-over-round bench claims use the calibrated ratio
whenever both rounds carry a calibration; raw ratios are labeled as such.
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
    oc, nc = old.get("calibration_sec"), new.get("calibration_sec")
    cal = bool(oc and nc)
    # normalization factor applied to NEW values to express them in the
    # OLD run's host-speed units: new_sec * (old_cal / new_cal)
    f = (oc / nc) if cal else 1.0
    print(f"suite total: {old.get('value')}s -> {new.get('value')}s "
          f"({len(oq)} -> {len(nq)} queries)")
    common = sorted(set(oq) & set(nq))
    if cal:
        o_sum = sum(oq[n] for n in common)
        n_sum = sum(nq[n] for n in common)
        print(f"calibration: old={oc:.3f}s new={nc:.3f}s "
              f"(host speed factor {nc / oc:.2f}x)")
        print(f"overlap ({len(common)} queries): raw {o_sum:.1f}s -> "
              f"{n_sum:.1f}s = {n_sum / o_sum:.2f}x; CALIBRATED "
              f"{n_sum * f / o_sum:.2f}x")
    moved = []
    for name in common:
        a, b = oq[name], nq[name] * f
        if a <= 0:
            continue
        pct = 100.0 * (b - a) / a
        if abs(pct) >= thr and abs(b - a) >= 0.3:  # ignore sub-noise moves
            moved.append((pct, name, a, b))
    tag = "calibrated " if cal else ""
    for pct, name, a, b in sorted(moved, reverse=True):
        print(f"  {pct:+7.1f}%  {name:34s} {a:6.2f}s -> {b:6.2f}s ({tag}new)")
    # [new] rows carry the same factor f so every per-query number in a
    # calibrated report is in the OLD run's host-speed units; [removed]
    # rows are old-run values, already in those units (ADVICE r9).
    for name in sorted(set(nq) - set(oq)):
        print(f"  [new]     {name:34s}          -> {nq[name] * f:6.2f}s ({tag}new)")
    for name in sorted(set(oq) - set(nq)):
        print(f"  [removed] {name:34s} {oq[name]:6.2f}s (old units)")
    if not moved:
        print(f"  no common query moved more than {thr:.0f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
