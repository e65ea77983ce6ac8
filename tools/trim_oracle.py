#!/usr/bin/env python3
"""Trim a Verify outDir's oracle_sql.json to the queries actually dumped.

Usage: trim_oracle.py <verifyOutDir>

Verify with SPARK_GRAFT_ONLY writes parquet dirs for the selected subset
but always dumps the FULL oracle map; check_oracle.py treats a missing
dir as FAIL. For subset passes (the 10x DuckDB spot-check), drop oracle
entries with no corresponding dump so the checker grades exactly the
chosen set.
"""
import json, os, sys

d = sys.argv[1]
p = os.path.join(d, "oracle_sql.json")
oracle = json.load(open(p))
kept = {k: v for k, v in oracle.items() if os.path.isdir(os.path.join(d, k))}
json.dump(kept, open(p, "w"))
print(f"kept {len(kept)}/{len(oracle)} oracle entries")
