#!/usr/bin/env python3
"""Standing money-magnitude stress gate (r13 verdict directive #3).

The normal-SF oracle gate CANNOT catch a missed decD/oracle mirror —
both DECIMAL->DOUBLE cast routes agree below 2^53 micro-units — so
every op whose contract touches exact money casts must ALSO gate on
the inflated corpora from tools/make_stress.py, where group sums cross
2^53. r13 ran that sweep by hand (it caught two live bug classes);
this script makes it a per-op gate the build loop runs mechanically.

Usage:
  python3 tools/money_gate.py <verifyJar> <stressRelDir> <stressDenseDir> \
      [query ...]

  <verifyJar>      class snapshot (jar cf /tmp/graft.jar -C target/... .)
  [query ...]      gate only these queries (new-op mode). With no names,
                   gates EVERY money query in the registry (sweep mode).

Money-query selection: any oracle whose SQL contains DECIMAL(18,6) /
the micro-BIGINT cast spine — the textual signature of the decD
contract (engine and oracle are co-edited by construction, so the
oracle text is a faithful plan marker).

Per-query verdict on each corpus:
  PASS        both engines produced results, exact hash match
  LOUD-OK     BOTH engines raised (the out-of-envelope guards working;
              r13 sessions 21/22 triage rule)
  EMPTY-OK    both sides produced zero rows (fixed-predicate ops whose
              selection goes empty on inflated values, s17 class)
  FAIL        value mismatch, or ONE engine raised while the other
              answered (the silent-divergence class this gate exists
              to kill)

Exit 0 iff no FAIL.
"""
import sys, json, os, subprocess, tempfile, glob
import duckdb
import pandas as pd
import numpy as np

SPARK_JARS = "/opt/spark/jars/*"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="first") \
           .reset_index(drop=True)
    return df


def run_verify(jar, sf_dir, out_dir, names):
    env = dict(os.environ)
    env["SPARK_GRAFT_ONLY"] = ",".join(names)
    subprocess.run(
        ["java", "-Xmx32g", "-cp", f"{jar}:{SPARK_JARS}",
         "graft.Verify", sf_dir, out_dir],
        env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return json.load(open(f"{out_dir}/failed.json"))


def gate_corpus(tag, jar, sf_dir, names, oracle):
    out_dir = tempfile.mkdtemp(prefix=f"money_gate_{tag}_")
    spark_failed = run_verify(jar, sf_dir, out_dir, names)
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[: -len(".parquet")]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    fails = []
    for name in names:
        duck_err = None
        ddf = None
        try:
            ddf = normalize(con.sql(oracle[name]).df())
        except Exception as e:
            duck_err = str(e).split("\n")[0][:120]
        if name in spark_failed:
            if duck_err is not None:
                print(f"LOUD-OK  [{tag}] {name}")
            else:
                print(f"FAIL     [{tag}] {name}: Spark raised "
                      f"({spark_failed[name][:90]}) but DuckDB answered "
                      f"{len(ddf)} rows")
                fails.append(name)
            continue
        if duck_err is not None:
            print(f"FAIL     [{tag}] {name}: DuckDB raised ({duck_err}) "
                  "but Spark answered")
            fails.append(name)
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL     [{tag}] {name}: no spark output")
            fails.append(name)
            continue
        try:
            sdf = normalize(pd.read_parquet(spark_path))
        except Exception as e:
            # an empty scratch-parquet read (zero-row fixed-predicate
            # selection) pairs with an empty oracle result
            if len(ddf) == 0:
                print(f"EMPTY-OK [{tag}] {name}")
                continue
            print(f"FAIL     [{tag}] {name}: spark read error {e}")
            fails.append(name)
            continue
        if len(sdf) == 0 and len(ddf) == 0:
            print(f"EMPTY-OK [{tag}] {name}")
            continue
        if list(sdf.columns) != list(ddf.columns) or len(sdf) != len(ddf):
            print(f"FAIL     [{tag}] {name}: shape spark="
                  f"{len(sdf)}x{list(sdf.columns)} duck="
                  f"{len(ddf)}x{list(ddf.columns)}")
            fails.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(
                sdf, ddf, check_dtype=False, check_exact=True)
            print(f"PASS     [{tag}] {name} ({len(sdf)} rows)")
        except AssertionError:
            detail = ""
            for c in sdf.columns:
                a, b = sdf[c].values, ddf[c].values
                neq = ~((pd.Series(a) == pd.Series(b))
                        | (pd.isna(a) & pd.isna(b))).values
                if neq.any():
                    i = int(np.argmax(neq))
                    detail = f" col={c} row={i}: spark={a[i]!r} duck={b[i]!r}"
                    break
            print(f"FAIL     [{tag}] {name}: VALUE MISMATCH{detail}")
            fails.append(name)
    return fails


def main():
    jar, rel_dir, dense_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    explicit = sys.argv[4:]
    sql_dir = tempfile.mkdtemp(prefix="money_gate_sql_")
    subprocess.run(
        ["java", "-cp", f"{jar}:{SPARK_JARS}",
         "graft.Verify", "--sql-only", sql_dir],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    oracle = json.load(open(f"{sql_dir}/oracle_sql.json"))
    money = sorted(n for n, sql in oracle.items()
                   if "DECIMAL(18,6)" in sql.upper().replace(" ", ""))
    if explicit:
        missing = [n for n in explicit if n not in oracle]
        if missing:
            print(f"unknown queries: {missing}")
            sys.exit(2)
        names = explicit
        not_money = [n for n in names if n not in money]
        if not_money:
            print(f"note: no DECIMAL(18,6) signature in: {not_money} "
                  "(gated anyway)")
    else:
        names = money
    print(f"money gate: {len(names)} queries x 2 corpora")
    fails = gate_corpus("rel", jar, rel_dir, names, oracle)
    fails += gate_corpus("dense", jar, dense_dir, names, oracle)
    if fails:
        print(f"\nMONEY GATE FAILED: {sorted(set(fails))}")
        sys.exit(1)
    print("\nmoney gate clean: no silent cross-engine divergence")


if __name__ == "__main__":
    main()
