#!/usr/bin/env python3
"""Static audit: list oracle CTEs referenced more than once that are
not MATERIALIZED. Context (r13): DuckDB may re-evaluate an inlined CTE
once per reference — harmless for panel-sized bodies, but when the
body embeds a row-scale scan the re-runs compound (measured at the 10x
replica: graph_mst's recursion re-ran the flows join per step >240s;
the recsys chain's pair self-join re-ran per reference until the spill
exceeded free disk; gold_fct_star re-derived its staged/SCD2 chains
>1500s — all fixed by AS MATERIALIZED, output-identical).

This audit is ADVISORY: a flagged CTE is only a defect if its body is
row-scale AND its consumers are expensive; everything it flags today
is hash-green at both gate scales. Use it when authoring NEW oracles
or when a replica sweep times out.

Usage: oracle_cte_audit.py <verify_out_dir_with_oracle_sql.json>
"""
import json
import re
import sys

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
flagged = 0
for name in sorted(oracle):
    sql = oracle[name]
    defs = re.findall(
        r'(?:^|,|\bWITH(?:\s+RECURSIVE)?)\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*'
        r'(?:\([^)]*\))?\s+AS\s+(MATERIALIZED\s+)?\(', sql, re.I)
    hits = []
    for cte, mat in defs:
        if mat:
            continue
        refs = len(re.findall(r'\b' + re.escape(cte) + r'\b', sql)) - 1
        if refs >= 2:
            hits.append(f"{cte}(x{refs})")
    if hits:
        flagged += 1
        print(f"{name}: {' '.join(hits)}")
print(f"\n{flagged}/{len(oracle)} oracles with multi-referenced "
      "unmaterialized CTEs (advisory — see docstring)")
