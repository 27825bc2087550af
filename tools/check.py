#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in
DuckDB with the sf tables registered as views, and compares:
row count, column names, and a hash over rows sorted by all columns
(columns ordered by name) — approximating the driver's compare.
"""
import sys, os, json, glob
import duckdb

def canon(rows):
    def c(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return sorted([tuple(c(v) for v in r) for r in rows])

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noor = 0
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if not os.path.isdir(full):
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet('{full}/*.parquet')")
        got_cols = sorted(got_rel.columns)
        # The driver reads the two sides through different decimal paths
        # (pyarrow object-Decimal vs duckdb float64) — DECIMAL output
        # columns hash-mismatch there even when values are equal. Never
        # emit them (CORRECTNESS_r02: q01/q03/q25).
        dec_cols = [c for c, t in zip(got_rel.columns, got_rel.types)
                    if "DECIMAL" in str(t).upper()]
        if dec_cols:
            print(f"[DECIML] {d:24s} decimal output cols={dec_cols}")
            n_fail += 1
            continue
        got = con.sql(
            "SELECT " + ", ".join(f'"{x}"' for x in got_cols)
            + " FROM got_rel").fetchall()
        if d not in oracle:
            print(f"[noorcl] {d:24s} rows={len(got)}")
            n_noor += 1
            continue
        try:
            exp_rel = con.sql(oracle[d])
            exp_cols = sorted(exp_rel.columns)
            exp = con.sql(
                "SELECT " + ", ".join(f'"{x}"' for x in exp_cols)
                + f" FROM ({oracle[d]})").fetchall()
        except Exception as e:
            print(f"[ORCERR] {d:24s} {e}")
            n_fail += 1
            continue
        # Same decimal-path hazard on the ORACLE side: DuckDB returns
        # HUGEINT for SUM(int)/length sums and DECIMAL for some aggs;
        # the driver hashes those via the object path and mismatches a
        # value-identical Spark LONG/DOUBLE (CORRECTNESS_r03: q58).
        # Wrap the oracle expr in CAST(... AS BIGINT/DOUBLE).
        exp_bad = [c for c, t in zip(exp_rel.columns, exp_rel.types)
                   if "DECIMAL" in str(t).upper() or "HUGEINT" in str(t).upper()]
        if exp_bad:
            print(f"[ORCTYP] {d:24s} oracle HUGEINT/DECIMAL cols={exp_bad}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"[COLS  ] {d:24s} got={got_cols} exp={exp_cols}")
            n_fail += 1
            continue
        cg, ce = canon(got), canon(exp)
        if len(cg) != len(ce):
            print(f"[ROWS  ] {d:24s} got={len(cg)} exp={len(ce)}")
            n_fail += 1
            continue
        if cg == ce:
            print(f"[ok    ] {d:24s} rows={len(cg)}")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(cg, ce) if a != b]
            print(f"[VALUES] {d:24s} rows={len(cg)} mismatched={len(diffs)}")
            for a, b in diffs[:3]:
                print(f"     got {a}\n     exp {b}")
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_noor}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
