#!/usr/bin/env python3
"""One-command round gate (r14 verdict directive #4).

The round closeout previously took four hand-run sweeps — sf0.01
correctness + oracle-type check, sf0.1 correctness, the money-magnitude
stress gate, and two stress symmetry triages — and a sweep skipped by
hand is a sweep skipped silently. This tool runs all of them and emits
ONE machine-readable disposition JSON the BUILDLOG closeout quotes.

Phases
  sf0.01        full-registry Verify + DuckDB hash compare + oracle
                result-type gate (check_oracle_types.py)
  sf0.1         full-registry Verify + DuckDB hash compare
  stress_rel    full-registry Verify on the money-magnitude relational
                corpus (tools/make_stress.py relational), every query
                classified PASS / LOUD-BOTH / EMPTY-OK / ASYMMETRIC /
                VALUE-FAIL — this is tools/money_gate.py's
                classification applied to the WHOLE registry, so it
                subsumes the money sweep (every DECIMAL(18,6) oracle is
                in the registry) AND the loud-symmetry triage that
                caught w_kyle_lambda in r14
  stress_dense  same on the dense (row-replicated events) corpus

Disposition is GREEN iff: zero sf0.01/sf0.1 hash failures, the type
gate is clean, and neither stress phase has an ASYMMETRIC or
VALUE-FAIL row. Anything else is RED with the offender named.

Usage:
  python3 tools/gate.py [--out gate.json] [--workdir DIR] [--jar JAR]
      [--sf001 DIR] [--sf01 DIR] [--stress-rel DIR] [--stress-dense DIR]
      [--skip sf0.1,stress_dense] [--cpus N]

Defaults regenerate the stress corpora from sf0.01 (deterministic) and
snapshot target/scala-2.13/classes into a jar. Verify runs through
spark-submit (NOT raw java: the JDK17 --add-opens flags matter the
first time a cached block spills — the r14 sf10 lesson).
"""
import argparse, datetime, glob, json, os, re, shutil, subprocess, sys
import tempfile

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def sh(cmd, env=None, capture=False, check=True):
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, env=e, check=check,
                       stdout=subprocess.PIPE if capture else None,
                       stderr=subprocess.STDOUT if capture else None)
    return r.stdout.decode() if capture else None


def snapshot_jar(workdir):
    classes = os.path.join(REPO, "target/scala-2.13/classes")
    jar = os.path.join(workdir, "graft.jar")
    subprocess.run(["jar", "cf", jar, "-C", classes, "."], check=True)
    return jar


def run_verify(jar, sf_dir, out_dir, cpus, shuffle, extra_env=None):
    env = {"SPARK_GRAFT_CPUS": str(cpus), "SPARK_GRAFT_SHUFFLE": str(shuffle)}
    if extra_env:
        env.update(extra_env)
    sh([SPARK_SUBMIT, "--driver-memory", "48g", "--class", "graft.Verify",
        jar, sf_dir, out_dir], env=env, capture=True)
    return json.load(open(f"{out_dir}/failed.json"))


def check_oracle(sf_dir, out_dir):
    """Run the hash compare; return (passed, failed, fail_names)."""
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/check_oracle.py"),
         sf_dir, out_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    text = p.stdout.decode()
    m = re.search(r"(\d+) passed, (\d+) failed", text)
    fails = re.findall(r"^FAIL (\S+?):", text, re.M)
    return (int(m.group(1)), int(m.group(2)), sorted(set(fails)), text)


def check_types(sf_dir, out_dir):
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/check_oracle_types.py"),
         sf_dir, f"{out_dir}/oracle_sql.json", out_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    return p.returncode == 0, p.stdout.decode()[-2000:]


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns),
                          na_position="first").reset_index(drop=True)


def classify_stress(tag, sf_dir, out_dir, spark_failed, oracle):
    """money_gate.py's per-query verdict, registry-wide."""
    con = duckdb.connect()
    if os.environ.get("DUCKDB_MEM"):
        con.sql(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    spill = (os.environ.get("DUCKDB_TMP", "/tmp/duckdb_oracle_spill")
             + f"/pid{os.getpid()}")
    os.makedirs(spill, exist_ok=True)  # DuckDB won't create parents
    con.sql(f"SET temp_directory='{spill}'")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[: -len(".parquet")]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    counts = {"pass": 0, "loud_both": 0, "empty_ok": 0}
    asym, vfail = [], []
    for name in sorted(oracle):
        duck_err, ddf = None, None
        try:
            ddf = normalize(con.sql(oracle[name]).df())
        except Exception as e:
            duck_err = str(e).split("\n")[0][:160]
        if name in spark_failed:
            if duck_err is not None:
                counts["loud_both"] += 1
            else:
                asym.append(f"{name}: Spark raised "
                            f"({spark_failed[name][:90]}) but DuckDB "
                            f"answered {len(ddf)} rows")
            continue
        if duck_err is not None:
            asym.append(f"{name}: DuckDB raised ({duck_err}) "
                        "but Spark answered")
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            vfail.append(f"{name}: no spark output")
            continue
        try:
            sdf = normalize(pd.read_parquet(spark_path))
        except Exception:
            # empty scratch-parquet (zero-row fixed-predicate selection)
            if len(ddf) == 0:
                counts["empty_ok"] += 1
                continue
            vfail.append(f"{name}: unreadable spark output")
            continue
        if len(sdf) == 0 and len(ddf) == 0:
            counts["empty_ok"] += 1
            continue
        if list(sdf.columns) != list(ddf.columns) or len(sdf) != len(ddf):
            vfail.append(f"{name}: shape spark={len(sdf)}x"
                         f"{list(sdf.columns)} duck={len(ddf)}x"
                         f"{list(ddf.columns)}")
            continue
        try:
            pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False,
                                          check_exact=True)
            counts["pass"] += 1
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
            vfail.append(f"{name}: VALUE MISMATCH{detail}")
    con.close()
    return {**counts, "asymmetric": asym, "value_fail": vfail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gate_result.json")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--jar", default=None)
    ap.add_argument("--sf001", default="/root/testdata/sf0.01")
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--stress-rel", default=None)
    ap.add_argument("--stress-dense", default=None)
    ap.add_argument("--skip", default="")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--shuffle", type=int, default=32)
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    workdir = args.workdir or tempfile.mkdtemp(prefix="gate_")
    os.makedirs(workdir, exist_ok=True)
    jar = args.jar or snapshot_jar(workdir)
    head = sh(["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
              capture=True).strip()

    result = {"head": head,
              "generated": datetime.datetime.utcnow().isoformat() + "Z",
              "phases": {}}
    red = []

    for phase, sf_dir, with_types in (
            ("sf0.01", args.sf001, True), ("sf0.1", args.sf01, False)):
        if phase in skip:
            result["phases"][phase] = {"skipped": True}
            continue
        print(f"=== {phase}: Verify {sf_dir}", flush=True)
        out_dir = os.path.join(workdir, f"verify_{phase.replace('.', '')}")
        spark_failed = run_verify(jar, sf_dir, out_dir,
                                  args.cpus, args.shuffle)
        n_pass, n_fail, fail_names, _ = check_oracle(sf_dir, out_dir)
        ph = {"passed": n_pass, "failed": n_fail, "fails": fail_names,
              "spark_errors": sorted(spark_failed)}
        if spark_failed:
            red.append(f"{phase}: Spark errors {sorted(spark_failed)}")
        if n_fail:
            red.append(f"{phase}: {n_fail} hash fails {fail_names[:8]}")
        if with_types:
            ok, detail = check_types(sf_dir, out_dir)
            ph["types_ok"] = ok
            if not ok:
                ph["types_detail"] = detail
                red.append(f"{phase}: type gate RED")
        result["phases"][phase] = ph
        print(f"    {n_pass} passed, {n_fail} failed", flush=True)

    stress = {}
    if not {"stress_rel", "stress_dense"} <= skip:
        if args.stress_rel:
            stress["stress_rel"] = args.stress_rel
        else:
            d = os.path.join(workdir, "stress_rel")
            if not os.path.isdir(d):
                sh([sys.executable, os.path.join(REPO, "tools/make_stress.py"),
                    args.sf001, d, "relational"], capture=True)
            stress["stress_rel"] = d
        if args.stress_dense:
            stress["stress_dense"] = args.stress_dense
        else:
            d = os.path.join(workdir, "stress_dense")
            if not os.path.isdir(d):
                sh([sys.executable, os.path.join(REPO, "tools/make_stress.py"),
                    args.sf001, d, "dense"], capture=True)
            stress["stress_dense"] = d

    for phase in ("stress_rel", "stress_dense"):
        if phase in skip or phase not in stress:
            result["phases"][phase] = {"skipped": True}
            continue
        sf_dir = stress[phase]
        print(f"=== {phase}: Verify {sf_dir}", flush=True)
        out_dir = os.path.join(workdir, f"verify_{phase}")
        spark_failed = run_verify(jar, sf_dir, out_dir,
                                  args.cpus, args.shuffle)
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
        ph = classify_stress(phase, sf_dir, out_dir, spark_failed, oracle)
        result["phases"][phase] = ph
        for a in ph["asymmetric"]:
            red.append(f"{phase} ASYMMETRIC {a}")
        for v in ph["value_fail"]:
            red.append(f"{phase} VALUE-FAIL {v}")
        print(f"    pass={ph['pass']} loud_both={ph['loud_both']} "
              f"empty_ok={ph['empty_ok']} asym={len(ph['asymmetric'])} "
              f"vfail={len(ph['value_fail'])}", flush=True)

    result["red"] = red
    result["disposition"] = "RED" if red else "GREEN"
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nGATE {result['disposition']} -> {args.out}")
    for r in red:
        print(f"  RED: {r}")
    sys.exit(1 if red else 0)


if __name__ == "__main__":
    main()
