#!/usr/bin/env python3
"""Dev-only self-check harness (mimics the driver's DuckDB oracle compare).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sf parquet tables,
sorts columns by name and rows by all columns, and diffs values exactly
(floats via repr). Exits non-zero listing mismatching queries.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                 str(type(v)).find("ndarray") >= 0 else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cell_eq(a, b):
    if pd.isna(a) if not isinstance(a, tuple) else False:
        return (pd.isna(b) if not isinstance(b, tuple) else False)
    if isinstance(a, float) and isinstance(b, float):
        return repr(float(a)) == repr(float(b)) or a == b
    if isinstance(a, float) != isinstance(b, float):
        # int64 vs float64 reprs differ ('3700493' vs '3700493.0') even when
        # values are ==; the driver hashes reprs, so this must FAIL here too.
        return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            # driver testdata is a single file; Spark-written fixtures
            # (e.g. the r8 ScaleUp sf1 dir) are part-file directories
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, passed, rows_only = [], [], []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # Absence must be loud: a crashed query writes no parquet dir, so
    # without the manifest cross-check a shrinking result set reads as
    # healthier (round 6: 7 queries silently absent, 145/148 "green").
    mpath = f"{out_dir}/manifest.json"
    if os.path.exists(mpath):
        manifest = json.load(open(mpath))
        for name in manifest.get("attempted", []):
            if name not in names:
                failures.append((name, "ABSENT: query attempted but wrote no output"
                                 + (" (crashed in Verify)" if name in manifest.get("failed", []) else "")))
    else:
        failures.append(("<manifest>", "manifest.json missing from verify dump — "
                         "absent queries would be invisible; re-run graft.Verify"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no parquet output")); continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        if name not in oracle:
            rows_only.append((name, len(got)))
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}")); continue
        if list(got.columns) != list(exp.columns):
            failures.append((name, f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"))
            continue
        if len(got) != len(exp):
            failures.append((name, f"row count differ: spark={len(got)} oracle={len(exp)}"))
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cell_eq(got.at[i, c], exp.at[i, c]):
                    bad = (i, c, got.at[i, c], exp.at[i, c]); break
            if bad: break
        if bad:
            failures.append((name, f"value mismatch at row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}"))
        else:
            passed.append((name, len(got)))
    for n, r in passed: print(f"PASS  {n}  ({r} rows)")
    for n, r in rows_only: print(f"ROWS-ONLY  {n}  ({r} rows, no oracle)")
    for n, msg in failures: print(f"FAIL  {n}: {msg}")
    print(f"\n{len(passed)} pass, {len(rows_only)} rows-only, {len(failures)} fail")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
