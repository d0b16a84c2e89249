#!/usr/bin/env python3
"""SURVEY §5.1 <-> driver-artifact drift gate (developer tooling).

The rows-only (no-oracle) set exists in three places: the registry
(SparkEntry.queries minus SparkEntry.oracleSql — observable in a
Verify dump as result dirs minus oracle_sql.json keys), the SURVEY
§5.1 table, and the §5.1 header's count. r13's verdict caught the
header saying "28" while the table (and the driver) said 26 — prose
drifted from the artifact. This asserts all three agree, so preclose
fails loudly on any future drift.

Usage: python3 tools/rows_only_audit.py <verifyOutDir> [survey.md]
"""
import json
import os
import re
import sys

OUT_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
SURVEY = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")


def main():
    oracle = set(json.load(open(f"{OUT_DIR}/oracle_sql.json")))
    dumped = {d for d in os.listdir(OUT_DIR)
              if os.path.isdir(os.path.join(OUT_DIR, d))}
    no_oracle = dumped - oracle

    text = open(SURVEY).read()
    m = re.search(r"### §5\.1[^\n]*\n(.*?)(?=\n### |\nRound-)", text, re.S)
    if not m:
        sys.exit("rows_only_audit: cannot find §5.1 section in SURVEY.md")
    section = m.group(1)
    hdr = re.search(r"Exactly these (\d+) registry entries", section)
    if not hdr:
        sys.exit("rows_only_audit: §5.1 header count sentence missing")
    header_count = int(hdr.group(1))
    table = set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, re.M))

    problems = []
    if header_count != len(table):
        problems.append(
            f"§5.1 header says {header_count} but table lists {len(table)}")
    if table != no_oracle:
        extra = sorted(table - no_oracle)
        missing = sorted(no_oracle - table)
        if extra:
            problems.append(f"in §5.1 table but oracle-checked/absent: {extra}")
        if missing:
            problems.append(f"driver rows-only but missing from §5.1: {missing}")
    if problems:
        for p in problems:
            print(f"FAIL rows_only_audit: {p}")
        sys.exit(1)
    print(f"OK   rows_only_audit: §5.1 table == driver no_oracle set "
          f"({len(table)} entries, header count matches)")


if __name__ == "__main__":
    main()
