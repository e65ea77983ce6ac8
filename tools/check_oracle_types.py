#!/usr/bin/env python3
"""Oracle result-type gate — kills the DuckDB HUGEINT hash-break class.

Three rounds in a row a query went hash-red not because values differed
but because DuckDB silently promoted an integer aggregate to HUGEINT
(int128) while Spark emitted BIGINT: the driver's hash compares the
*encoded* values, so identical numbers hash differently. The fix is
always a one-line CAST in the oracle SQL — this gate makes the class
mechanically impossible to re-introduce.

Usage: check_oracle_types.py <sfDir> <oracle_sql.json> [verifyOutDir]

For every oracle query, DESCRIBEs the statement in DuckDB against the
real parquet tables and asserts every result column types as one of
BIGINT / INTEGER / DOUBLE / VARCHAR / TIMESTAMP / DATE / BOOLEAN.
Anything else (HUGEINT, DECIMAL, FLOAT, UBIGINT, TIME, interval, nested)
fails, naming the query and column. Exit 0 = gate green.

With the optional third arg (a graft.Verify output dir), ALSO
cross-checks each query's Spark parquet schema against the DuckDB
DESCRIBE types at the type-FAMILY level: integer widths are compatible
(the driver's compare normalizes them — proven by years of green rows
with Spark INTEGER against DuckDB BIGINT), but a cross-family pair
(INT vs DOUBLE, TIMESTAMP vs DATE, VARCHAR vs anything) is the silent
hash-break class this pass exists for. Queries without a parquet dump
are skipped in this pass.

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


# arrow type label → the DuckDB DESCRIBE label it must pair with for the
# driver's encoded-value hash to agree
ARROW_TO_DUCK = {
    "int8": "INTEGER", "int16": "INTEGER", "int32": "INTEGER",
    "int64": "BIGINT", "double": "DOUBLE",
    "string": "VARCHAR", "large_string": "VARCHAR", "bool": "BOOLEAN",
    "date32[day]": "DATE",
}


def duck_label(arrow_type: str) -> str:
    if arrow_type.startswith("timestamp["):
        return "TIMESTAMP"
    return ARROW_TO_DUCK.get(arrow_type, f"?{arrow_type}")


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    verify_dir = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    n_bad = n_cross = 0
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
        if verify_dir and os.path.isdir(f"{verify_dir}/{name}"):
            import pyarrow.parquet as pq
            files = glob.glob(f"{verify_dir}/{name}/*.parquet")
            if not files:
                continue
            spark_types = {f.name: duck_label(str(f.type))
                           for f in pq.ParquetFile(files[0]).schema_arrow}
            duck_types = {c: t for c, t, *_ in desc}
            # families the driver's value-normalizing compare accepts:
            # any integer width pairs with any integer width, and a
            # DuckDB DATE pairs with a Spark TIMESTAMP (proven by green
            # rows since r6). The EMPIRICAL breakers: cross-family pairs
            # (INT vs DOUBLE, VARCHAR vs anything) and a SPARK-side DATE
            # (materializes as un-hashable python date objects in the
            # driver — the e_time_to_convert lesson).
            fam = lambda t: ("INT" if t in ("BIGINT", "INTEGER")
                             else "TIME" if t in ("TIMESTAMP", "DATE")
                             else t)
            for c in sorted(set(spark_types) & set(duck_types)):
                if spark_types[c] == "DATE":
                    print(f"FAIL {name}: column '{c}' is DATE on the "
                          f"SPARK side — cast to TIMESTAMP (driver "
                          f"hashes python date objects apart)")
                    n_cross += 1
                elif fam(spark_types[c]) != fam(duck_types[c]):
                    print(f"FAIL {name}: column '{c}' is {spark_types[c]} "
                          f"in Spark but {duck_types[c]} in DuckDB — "
                          f"cross-family, hash-breaks; align the CASTs")
                    n_cross += 1
            missing = set(duck_types) - set(spark_types)
            extra = set(spark_types) - set(duck_types)
            if missing or extra:
                print(f"FAIL {name}: column sets differ "
                      f"(oracle-only: {sorted(missing)}, "
                      f"spark-only: {sorted(extra)})")
                n_cross += 1
    cross_note = (f", {n_cross} cross-engine mismatches"
                  if verify_dir else "")
    print(f"\n{len(oracle)} oracles checked, {n_bad} with disallowed types"
          f"{cross_note}")
    sys.exit(1 if (n_bad or n_cross) else 0)


if __name__ == "__main__":
    main()
