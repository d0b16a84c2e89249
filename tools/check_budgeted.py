#!/usr/bin/env python3
"""Per-query-budgeted wrapper around tools/check.py for scale-replica
sweeps: each query runs in its own subprocess under a wall budget, so
one pathologically expensive DuckDB oracle replay (e.g. the per-row
as-of nearest scan at 10x) cannot starve the rest of the sweep. A
query exceeding the budget is recorded as err="oracle_timeout(<N>s)" —
an ORACLE-COST exclusion, not a correctness failure (every such query
is hash-verified at sf0.01 where the replay is cheap).

Usage: check_budgeted.py SF_DIR OUT_DIR BUDGET_SEC JSON_OUT [name ...]
"""
import json
import subprocess
import sys
import os

SF, OUT, BUDGET, JOUT = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
names = sys.argv[5:]
if not names:
    names = sorted(json.load(open(f"{OUT}/oracle_sql.json")))
here = os.path.dirname(os.path.abspath(__file__))
results = {}
for n in names:
    tmp = f"/tmp/.ckb_{os.getpid()}_{n}.json"  # pid-unique: concurrent sweeps must not collide
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(here, "check.py"), SF, OUT, n,
             "--json", tmp],
            timeout=BUDGET, capture_output=True, text=True)
        rec = json.load(open(tmp)).get(n)
        if rec is None:  # name absent from oracle map -> a failure, not a crash
            rec = {"rows_match": None, "schema_match": None,
                   "hash_match": None, "rows": None,
                   "err": "not in oracle_sql.json"}
        results[n] = rec
        tag = "OK  " if rec.get("hash_match") else "FAIL"
        print(f"{tag} {n} ({rec.get('rows')} rows)", flush=True)
    except subprocess.TimeoutExpired:
        results[n] = {"rows_match": None, "schema_match": None,
                      "hash_match": None, "rows": None,
                      "err": f"oracle_timeout({BUDGET}s)"}
        print(f"SKIP {n}: oracle replay exceeded {BUDGET}s at this scale",
              flush=True)
    except Exception as e:  # check.py hard crash (OOM-kill, no JSON): record, keep sweeping
        results[n] = {"rows_match": None, "schema_match": None,
                      "hash_match": None, "rows": None,
                      "err": f"checker_crash: {e}"[:300]}
        print(f"FAIL {n}: checker crashed ({e})", flush=True)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
with open(JOUT, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
skips = [n for n, r in results.items()
         if r.get("err") and str(r["err"]).startswith("oracle_timeout")]
# anything that is neither hash-green nor a budget skip IS a failure —
# a real oracle error must never read as "0 failures"
fails = [n for n, r in results.items()
         if n not in skips and not r.get("hash_match")]
print(f"\n{len(fails)} failures, {len(skips)} oracle-cost skips "
      f"of {len(results)}")
sys.exit(1 if fails else 0)
