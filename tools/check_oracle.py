#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same tables, and compares: columns sorted by name, rows sorted, values
exact (timestamps normalized to microseconds).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # big-sf runs: cap DuckDB so an iterative-oracle balloon can't take
    # the host down (r14: an 86 GB resident shard got OOM-killed mid-run)
    if os.environ.get("DUCKDB_MEM"):
        con.sql(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    # spill goes to an explicit PER-PROCESS dir, never cwd/.tmp — a
    # capped oracle spilled 57 GB into the REPO dir before this (r15),
    # and two processes sharing one spill dir corrupt each other's temp
    # files. DUCKDB_TMP overrides the parent (roomiest volume).
    spill = (os.environ.get("DUCKDB_TMP", "/tmp/duckdb_oracle_spill")
             + f"/pid{os.getpid()}")
    os.makedirs(spill, exist_ok=True)  # DuckDB won't create parents
    con.sql(f"SET temp_directory='{spill}'")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        # Spark writes directory-style parquet (ScaleGen's 10x dirs);
        # the driver testdata is single files — accept both
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional 3rd arg "i/n": check only the i-th of n round-robin
    # shards (0-based) so big-sf passes can run N processes in parallel
    names = sorted(oracle)
    if len(sys.argv) > 3:
        i, n = map(int, sys.argv[3].split("/"))
        names = names[i::n]
    n_pass = n_fail = 0
    for name in names:
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            sdf = normalize(pd.read_parquet(spark_path))
            ddf = normalize(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: {msg[0]} | {' '.join(msg[1:4])}")
            # show first mismatching cells
            for c in sdf.columns:
                a, b = sdf[c].values, ddf[c].values
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    neq = ~((a == b) | (pd.isna(a) & pd.isna(b)))
                else:
                    neq = ~((pd.Series(a) == pd.Series(b)) | (pd.isna(a) & pd.isna(b))).values
                if neq.any():
                    i = int(np.argmax(neq))
                    print(f"   col={c} row={i}: spark={a[i]!r} duck={b[i]!r}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
