#!/usr/bin/env python3
"""Diff a bench run against the checked-in perf baseline.

Usage:
    python3 tools/perf_diff.py [BENCH_DETAIL.json] [PERF_BASELINE.json]

Both files are the Bench.scala detail format: {"queries": {name:
{"sec": best, ...}}, "loadavg_before": "...", ...}. The baseline is a
quiet-host min-of-N run checked into the repo (PERF_BASELINE.json) so
"within 2x of the standing record" is a mechanical check, not a vibe.

Exit code 1 when any query regresses beyond THRESHOLD (default 2.0x,
override with PERF_DIFF_THRESHOLD) AND by more than ABS_FLOOR seconds
(default 1.0 — sub-second queries are noise-dominated at any ratio).
"""
import json
import os
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v["sec"] for k, v in d.get("queries", {}).items()}, d


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "PERF_BASELINE.json"
    threshold = float(os.environ.get("PERF_DIFF_THRESHOLD", "2.0"))
    abs_floor = float(os.environ.get("PERF_DIFF_ABS_FLOOR", "1.0"))
    cur, cur_meta = load(cur_path)
    base, base_meta = load(base_path)
    common = sorted(set(cur) & set(base))
    new = sorted(set(cur) - set(base))
    gone = sorted(set(base) - set(cur))
    ratios = sorted(((cur[q] / base[q] if base[q] > 0 else float("inf")), q)
                    for q in common)
    med = ratios[len(ratios) // 2][0] if ratios else float("nan")
    print(f"common={len(common)} new={len(new)} dropped={len(gone)} "
          f"median_ratio={med:.2f} "
          f"cur_load={cur_meta.get('loadavg_before', '?')} "
          f"base_load={base_meta.get('loadavg_before', '?')}")
    regressed = [(r, q) for r, q in ratios
                 if r > threshold and (cur[q] - base[q]) > abs_floor]
    for r, q in sorted(ratios, reverse=True)[:10]:
        mark = " <-- REGRESSED" if (r, q) in regressed else ""
        print(f"  {q}: {base[q]:.2f}s -> {cur[q]:.2f}s ({r:.2f}x){mark}")
    if new:
        print("new (no baseline):", ", ".join(new))
    if gone:
        print("dropped from registry:", ", ".join(gone))
    if gone:
        print(f"FAIL: {len(gone)} baseline queries missing from this run "
              "(truncated/partial bench) — a gate cannot pass on work it "
              "didn't measure")
        sys.exit(1)
    if regressed:
        print(f"{len(regressed)} queries beyond {threshold}x + {abs_floor}s")
        sys.exit(1)
    print("0 regressions")


if __name__ == "__main__":
    main()
