#!/usr/bin/env python3
"""Ledger completeness check: every query key in the newest
CORRECTNESS_r*.json (or an explicit json arg) must appear somewhere in
COVERAGE.md. TPC-H deck rows q1_agg..q22_* are covered by the single
deck row, so a bare `q<digits>_` prefix also counts as covered.

Usage: python3 tools/coverage_check.py [correctness.json]
Exit 0 = complete; exit 1 = missing rows (listed).
"""
import glob
import json
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if len(sys.argv) > 1:
    src = sys.argv[1]
else:
    cands = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not cands:
        print("no CORRECTNESS_r*.json found", file=sys.stderr)
        sys.exit(2)
    src = cands[-1]

keys = sorted(json.load(open(src)).keys())
cov = open(os.path.join(repo, "COVERAGE.md")).read()

deck = re.compile(r"^q\d+_")
missing = [k for k in keys
           if k not in cov and not (deck.match(k) and "q1_agg" in cov)]

print(f"{src}: {len(keys)} query keys, {len(keys) - len(missing)} ledgered")
if missing:
    print("MISSING from COVERAGE.md:")
    for k in missing:
        print(f"  {k}")
    sys.exit(1)
print("COVERAGE.md ledger complete")
