#!/usr/bin/env python3
"""Oracle result-type gate — kills the DuckDB HUGEINT hash-break class.

Three rounds in a row a query went hash-red not because values differed
but because DuckDB silently promoted an integer aggregate to HUGEINT
(int128) while Spark emitted BIGINT: the driver's hash compares the
*encoded* values, so identical numbers hash differently. The fix is
always a one-line CAST in the oracle SQL — this gate makes the class
mechanically impossible to re-introduce.

Usage: check_oracle_types.py <sfDir> <oracle_sql.json>

For every oracle query, DESCRIBEs the statement in DuckDB against the
real parquet tables and asserts every result column types as one of
BIGINT / INTEGER / DOUBLE / VARCHAR / TIMESTAMP / DATE / BOOLEAN.
Anything else (HUGEINT, DECIMAL, FLOAT, UBIGINT, TIME, interval, nested)
fails, naming the query and column. Exit 0 = gate green.

Scope limit: this checks only the DuckDB-side types against ALLOWED. A
cross-engine mismatch between two *allowed* types (e.g. Spark emitting
INTEGER where DuckDB emits BIGINT) would pass here yet still hash-break
under the driver's encoded-value compare — that class is caught
downstream by the driver's per-query schema_match row, and would need
the Verify parquet dumps (Spark-side schemas) to gate pre-emptively.

Generate the json without running queries:
  sbt "runMain graft.Verify --sql-only /tmp/sqlonly"
"""
import sys, json
import glob, os
import duckdb

# Types whose parquet encoding round-trips identically between Spark and
# DuckDB under the driver's sorted-values hash. HUGEINT is the known
# offender; DECIMAL/FLOAT(32) would break the same way (precision/repr).
ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "TIMESTAMP", "DATE",
           "BOOLEAN"}


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for name in sorted(oracle):
        try:
            desc = con.sql(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if t not in ALLOWED]
        if bad:
            for c, t in bad:
                print(f"FAIL {name}: column '{c}' types as {t} "
                      f"(allowed: {sorted(ALLOWED)}) — add a CAST in the "
                      f"oracle SQL")
            n_bad += 1
    print(f"\n{len(oracle)} oracles checked, {n_bad} with disallowed types")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
