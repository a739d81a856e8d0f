#!/usr/bin/env python3
"""Floor-adjusted comparison of two bench artifacts.

Raw per-query deltas between rounds conflate engine changes with the
documented ~1.55x ambient host noise (PLANS.md). With bench.py's
floor_s calibration (round 5) the comparison becomes attributable:
subtract each run's own floor before taking ratios, so a uniform
machine-state shift (which moves floor and queries together) cancels,
and what remains is per-query work change.

Usage: python tools/compare_bench.py OLD.json NEW.json [--top 15]
Accepts BENCH_DETAIL.json or BENCH_r{N}.json shapes (queries dict
required; floor_s optional — falls back to the run's minimum query
time as a floor proxy for pre-round-5 artifacts).
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> tuple[dict[str, float], float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" not in d and "tail" in d:
        # driver-recorded BENCH_r{N}.json: the metric JSON line is
        # embedded in the captured stdout tail
        for line in reversed(d["tail"].splitlines()):
            line = line.strip().lstrip("\r")
            if line.startswith("{") and '"queries"' in line:
                d = json.loads(line)
                break
    if "queries" not in d:
        raise SystemExit(
            f"{path}: no per-query timings found — not a BENCH_DETAIL "
            "shape, and no parseable metric JSON line in its 'tail' "
            "(the driver's ~2000-char stdout capture may have truncated "
            "the line's opening brace)")
    qs = {k: float(v) for k, v in d["queries"].items()}
    # explicit None check: a recorded floor of 0.0 is a real measurement,
    # not a missing one — `or` would silently swap in the min-query proxy
    floor = float(d["floor_s"] if d.get("floor_s") is not None
                  else min(qs.values()))
    return qs, floor


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    old, f_old = load(args.old)
    new, f_new = load(args.new)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries")
        return

    print(f"floor: old={f_old:.3f}s new={f_new:.3f}s "
          f"(machine-state shift x{f_new / f_old:.2f})")
    tot_old = sum(old[q] for q in common)
    tot_new = sum(new[q] for q in common)
    adj_old = sum(max(old[q] - f_old, 0.0) for q in common)
    adj_new = sum(max(new[q] - f_new, 0.0) for q in common)
    print(f"common {len(common)} queries: raw {tot_old:.1f}s -> "
          f"{tot_new:.1f}s (x{tot_new / tot_old:.2f}); floor-adjusted "
          f"{adj_old:.1f}s -> {adj_new:.1f}s "
          f"(x{adj_new / max(adj_old, 1e-9):.2f})")

    rows = []
    for q in common:
        a, b = max(old[q] - f_old, 0.0), max(new[q] - f_new, 0.0)
        # ignore sub-floor queries on both sides: pure scheduling noise
        if a < 0.05 and b < 0.05:
            continue
        rows.append((q, old[q], new[q], b - a))
    rows.sort(key=lambda r: -abs(r[3]))
    print(f"\nlargest floor-adjusted moves (top {args.top}):")
    for q, a, b, d in rows[:args.top]:
        print(f"  {q:38s} {a:7.2f}s -> {b:7.2f}s  ({d:+.2f}s adj)")


if __name__ == "__main__":
    main()
