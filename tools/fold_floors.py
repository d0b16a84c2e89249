#!/usr/bin/env python3
"""Fold one or more BENCH_DETAIL-format sweeps into a PERF_BASELINE.

Usage:
    python3 tools/fold_floors.py OUT.json SWEEP1.json [SWEEP2.json ...]

Per query the folded floor is the MIN of the input sweeps' reported
"sec" (each itself a min-of-passes). Metadata records the source
sweeps' loadavg so a floor taken under contention is self-diagnosing.
Refuses to drop queries: every query present in ANY input lands in the
output (a floor file that silently loses queries would blind
perf_diff's dropped-query gate).
"""
import json
import sys


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out_path = sys.argv[1]
    sweeps = [(p, json.load(open(p))) for p in sys.argv[2:]]
    floors = {}
    for path, d in sweeps:
        for name, rec in d.get("queries", {}).items():
            sec = rec["sec"]
            if name not in floors or sec < floors[name]["sec"]:
                floors[name] = {"sec": sec, "first": rec.get("first"),
                                "retime": rec.get("retime"),
                                "start_off_sec": rec.get("start_off_sec")}
    meta = {
        "metric": "floors",
        "value": round(sum(v["sec"] for v in floors.values()), 3),
        "unit": "sec",
        "n_queries": len(floors),
        "queries": floors,
        "loadavg_before": " | ".join(
            str(d.get("loadavg_before", "?")) for _, d in sweeps),
        "loadavg_after": " | ".join(
            str(d.get("loadavg_after", "?")) for _, d in sweeps),
        "folded_from": [p for p, _ in sweeps],
    }
    with open(out_path, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(floors)} floors, sum "
          f"{meta['value']} s")


if __name__ == "__main__":
    main()
