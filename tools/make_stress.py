#!/usr/bin/env python3
"""Money-magnitude stress corpora for the decD determinism sweep.

Copies an sf dir, inflating money columns so per-group DECIMAL
aggregates cross 2^53 micro-units (the Spark/DuckDB DECIMAL->DOUBLE
divergence threshold, r13 q1 class) while staying under the decD
micro-BIGINT ceiling (9.22e12 units per aggregate). A decD-swept
query whose oracle was NOT co-edited (or vice versa) then hash-FAILS
under tools/check_oracle.py — the normal-SF gate cannot detect that
(both cast routes agree below 2^53).

Input-cast fidelity bound (found empirically by the first stress run):
an INDIVIDUAL double value v cast to DECIMAL(18,6) only agrees
cross-engine while |v|*1e-16 < 0.5 micro, i.e. |v| < ~5e8 — past it
Spark's shortest-string HALF_UP and DuckDB's rint(v*1e6) can split on
the representation junk. So values stay < 5e8 and group sums cross
2^53 via row counts, which is also the honest 100-TB shape (many
modest rows, huge sums).

Modes
  relational   lineitem.l_extendedprice / orders.o_totalprice /
               part.p_retailprice x2e3, customer.c_acctbal x1e5,
               events.value x1e5. Stresses: q1/q5..q22 money sums,
               monthly revenue, per-nation balances, per-symbol trade
               usd/price sums (f16, a_unpivot, skew join).
  dense        events only: value x1e5 AND each row replicated x500
               (ms-jittered ts, re-keyed event_id). Stresses the
               SMALL-GROUP trade aggregates: per-minute (a1), sliding
               30s (a2), session (t15), 100-bar frames (w2b, k7).
               Money tables copied unchanged. Per-symbol trade ops
               would exceed the decD ceiling here — run them in
               `relational` mode instead.

Unstressable by construction: trade `volume` sums (volume is
synthesized from event_id in Tables.tradesCte, range 0.1..9.7 — no
data column to inflate) and row-bounded tiny groups (per-order q3,
per-customer q10/rfm at this SF). Those wraps are validated by
textual parallelism with the stressed forms plus the grep-extinction
audit (zero unwrapped decimal->double casts in main).

Usage: python3 tools/make_stress.py <src_sf_dir> <out_dir> <mode>
"""
import sys, os, shutil
import duckdb

REL_MULT = {
    "lineitem": {"l_extendedprice": "2000"},
    "orders": {"o_totalprice": "2000"},
    "part": {"p_retailprice": "2000"},
    "customer": {"c_acctbal": "100000"},
    "events": {"value": "100000"},
}

def copy_mult(con, sp, op, mult):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{sp}'").fetchall()]
    sel = ", ".join(
        f'"{c}" * {mult[c]} AS "{c}"' if c in mult else f'"{c}"'
        for c in cols)
    con.execute(f"COPY (SELECT {sel} FROM '{sp}') TO '{op}' "
                "(FORMAT PARQUET)")

def main(src, out, mode):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[:-len(".parquet")]
        sp, op = os.path.join(src, f), os.path.join(out, f)
        if mode == "relational" and name in REL_MULT:
            copy_mult(con, sp, op, REL_MULT[name])
            print(f"inflated {name}: {REL_MULT[name]}")
        elif mode == "dense" and name == "events":
            # x500 rows, ms jitter keeps minute/session membership;
            # re-keyed event_id stays unique (volume re-synthesizes
            # per row from it — harmless, volume is unstressable).
            con.execute(
                f"""COPY (
                  SELECT e.event_id * 500 + r.range AS event_id,
                         e.ts + (r.range || ' milliseconds')::INTERVAL
                           AS ts,
                         e.user_id, e.event_type,
                         e.value * 100000 AS value, e.props
                  FROM '{sp}' e CROSS JOIN range(0, 500) r
                ) TO '{op}' (FORMAT PARQUET)""")
            print("densified events: x500 rows, value x1e5")
        else:
            shutil.copyfile(sp, op)
    print(f"stress corpus ({mode}) at", out)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
