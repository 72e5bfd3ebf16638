#!/usr/bin/env python3
"""Local dev oracle check: compare Verify.scala's parquet dumps against
DuckDB running the same oracle SQL over the testdata parquet tables.
Mirrors the driver's compare (sort columns by name, hash values).
Usage: check_oracle.py SF_DIR OUT_DIR [query ...]
"""
import sys, os, json, glob
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
if not names:
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n)))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in names:
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        print(f"{name}: NO SPARK DUMP"); fails += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
    if name not in oracle:
        print(f"{name}: rows-only ({len(sdf)} rows)"); continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        print(f"{name}: SCHEMA MISMATCH {list(s.columns)} vs {list(o.columns)}"); fails += 1; continue
    if len(s) != len(o):
        print(f"{name}: ROWS {len(s)} vs {len(o)}"); fails += 1; continue
    # value compare mirroring the driver's repr-hash. EXACT by default —
    # the driver hashes exact values, so a tolerant local pass would hide
    # a driver fail (that is exactly what happened to s8/s9 in round 4).
    # GRAFT_ULP=1 re-enables the 1-ulp float tolerance for local triage of
    # known engine last-ulp drift; never leave it on when claiming green.
    ulp_ok = os.environ.get("GRAFT_ULP") == "1"
    eq = True
    for c in s.columns:
        a, b = s[c], o[c]
        try:
            # The driver's repr-hash distinguishes int64 `3700493` from
            # float64 `3700493.0` even when values match (DuckDB HUGEINT
            # sums land in pandas as float64). Coercing both sides to
            # float here would mask exactly that driver fail — so a
            # float-vs-nonfloat dtype pairing is a mismatch on its own.
            if (a.dtype.kind == 'f') != (b.dtype.kind == 'f') and not ulp_ok:
                print(f"{name}: DTYPE MISMATCH on {c}: {a.dtype} vs {b.dtype}")
                eq = False; break
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                av, bv = a.astype(float).values, b.astype(float).values
                both_nan = np.isnan(av) & np.isnan(bv)
                if ulp_ok:
                    close = np.abs(av - bv) <= np.spacing(np.maximum(np.abs(av), np.abs(bv)))
                else:
                    close = av == bv
                if not np.all(both_nan | close):
                    eq = False; break
            else:
                if not (a.astype(str).values == b.astype(str).values).all():
                    eq = False; break
        except Exception as e:
            eq = False; break
    print(f"{name}: {'OK' if eq else 'VALUE MISMATCH'} ({len(s)} rows)")
    fails += 0 if eq else 1
con.close()
sys.exit(1 if fails else 0)
