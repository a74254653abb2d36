#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query output parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same test tables, then
compares: row count, column names (sorted), and values (rows sorted, exact
equality; doubles compared bit-exactly first, then with rtol to classify
near-misses). This is a build-time self-check only — the engine itself is
pure Scala/Spark.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_tables(con, sf_dir):
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for stable sorting/compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name, mine, oracle):
    issues = []
    if list(mine.columns) != list(oracle.columns):
        issues.append(f"cols mine={list(mine.columns)} oracle={list(oracle.columns)}")
        return issues
    if len(mine) != len(oracle):
        issues.append(f"rows mine={len(mine)} oracle={len(oracle)}")
        return issues
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        # The driver hashes formatted values, so int64 vs float64 (e.g. a
        # DuckDB HUGEINT sum surfacing as float64) is a hash FAIL even when
        # the numbers are equal — flag dtype-kind mismatches hard.
        if a.dtype.kind != b.dtype.kind \
                and {a.dtype.kind, b.dtype.kind} <= {"i", "u", "f", "O"}:
            issues.append(
                f"col {c}: dtype kind mismatch mine={a.dtype} oracle={b.dtype}"
                " — driver hash would fail (cast the oracle sum to BIGINT?)")
            continue
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af, bf = a.astype(float).values, b.astype(float).values
            both_nan = np.isnan(af) & np.isnan(bf)
            exact = (af == bf) | both_nan
            if not exact.all():
                close = np.isclose(af, bf, rtol=1e-9, equal_nan=True)
                n_bad = (~exact).sum()
                if close.all():
                    issues.append(f"col {c}: {n_bad} values differ in last bits (rtol<1e-9) — FP drift")
                else:
                    k = np.argmax(~close)
                    issues.append(f"col {c}: {(~close).sum()} values differ; e.g. mine={af[k]} oracle={bf[k]}")
        else:
            eq = (a.astype(str).values == b.astype(str).values)
            if not eq.all():
                k = np.argmax(~eq)
                issues.append(f"col {c}: {(~eq).sum()} values differ; e.g. mine={a.iloc[k]!r} oracle={b.iloc[k]!r}")
    return issues

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    load_tables(con, sf_dir)
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noq = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        mine = canon(duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").df())
        if name not in oracle_sql:
            print(f"SKIP {name}: rows-only ({len(mine)} rows)"); n_noq += 1
            continue
        try:
            oracle = canon(con.execute(oracle_sql[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        issues = compare(name, mine, oracle)
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues)); n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noq} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
