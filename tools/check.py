#!/usr/bin/env python3
"""Local pre-verification harness (developer tooling, not library code).

Mimics the driver's correctness gate: runs graft.Verify output against
the DuckDB oracle SQL and compares row counts, schemas (column names)
and sorted-row value hashes, columns sorted by name.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import hashlib
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

ARGS = list(sys.argv[1:])
JSON_OUT = None
if "--json" in ARGS:
    i = ARGS.index("--json")
    if i + 1 >= len(ARGS):
        sys.exit("usage: check.py SF_DIR OUT_DIR [query ...] --json OUT.json")
    JSON_OUT = ARGS[i + 1]
    del ARGS[i:i + 2]
SF_DIR = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.01"
OUT_DIR = ARGS[1] if len(ARGS) > 1 else "/tmp/graft_verify"
ONLY = set(ARGS[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # Type-faithful: fetch goes through pandas (like the driver), so a
    # DuckDB HUGEINT surfaces as float64 and hashes differently from a
    # BIGINT ("6.0" vs "6") — str() on raw fetchall() would mask that.
    try:
        if v is None or (not isinstance(v, (list, tuple, np.ndarray)) and pd.isna(v)):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    return str(v)


def frame_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single files; ScaleUp replicas are
        # Spark part-file directories — accept both
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    failures = 0
    results = {}  # driver-format per-query record for --json
    # A requested name missing from the dumped oracle map is a FAILURE,
    # not a silent skip: it means the Verify run never produced it
    # (compile error, crashed dump, or a typo'd name) and a green
    # "0 failures" would be a lie.
    missing_requested = sorted(n for n in ONLY if n not in oracle)
    for name in missing_requested:
        print(f"FAIL {name}: not in {OUT_DIR}/oracle_sql.json (Verify never dumped it)")
        results[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "rows": None,
                         "err": "not in oracle_sql.json"}
        failures += 1
    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            got_df = con.execute(
                f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')").df()
            got_rows = list(got_df.itertuples(index=False, name=None))
            got_cols = list(got_df.columns)
            exp_df = con.execute(sql).df()
            exp_rows = list(exp_df.itertuples(index=False, name=None))
            exp_cols = list(exp_df.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "rows": None,
                             "err": str(e)[:300]}
            failures += 1
            continue
        problems = []
        if sorted(got_cols) != sorted(exp_cols):
            problems.append(f"schema {sorted(got_cols)} != {sorted(exp_cols)}")
        if len(got_rows) != len(exp_rows):
            problems.append(f"rows {len(got_rows)} != {len(exp_rows)}")
        # hash is only COMPUTED when schema+rows line up; a skipped
        # compare records None (unknown), not False (differs)
        hash_match = None
        if not problems:
            hash_match = frame_hash(got_rows, got_cols) == frame_hash(exp_rows, exp_cols)
            if not hash_match:
                problems.append("hash mismatch")
                # show first differing line for debugging
                order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
                order_e = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
                gl = sorted("\x1f".join(norm_cell(r[i]) for i in order_g) for r in got_rows)
                el = sorted("\x1f".join(norm_cell(r[i]) for i in order_e) for r in exp_rows)
                for a, b in zip(gl, el):
                    if a != b:
                        problems.append(f"  got: {a[:200]}\n  exp: {b[:200]}")
                        break
        results[name] = {
            "rows_match": len(got_rows) == len(exp_rows),
            "schema_match": sorted(got_cols) == sorted(exp_cols),
            "hash_match": hash_match,
            "rows": len(got_rows),
            "err": None,
        }
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
    print(f"\n{failures} failures")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
