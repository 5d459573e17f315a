#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name> parquet dir written by graft.Verify, runs the matching
oracle_sql.json entry in DuckDB over the sf_dir tables, normalizes both
(columns sorted by name, rows sorted by all columns) and compares.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
sqls = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


n_pass = n_fail = 0
for name in sorted(sqls):
    sql = sqls[name]
    try:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        a = norm(pd.read_parquet(f"{outdir}/{name}"))
        b = norm(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        n_fail += 1
        continue
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        n_fail += 1
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
        n_fail += 1
        continue
    ok = True
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = av.astype(float); bv = bv.astype(float)
            bad = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            if bad.any():
                i = int(np.argmax(bad))
                print(f"FAIL {name}: col {c} differs, e.g. row {i}: {av[i]!r} vs {bv[i]!r} (maxdiff {np.nanmax(np.abs(av-bv))})")
                ok = False
                break
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                bad = av.astype(str) != bv.astype(str)
                i = int(np.argmax(bad))
                print(f"FAIL {name}: col {c} differs, e.g. row {i}: {av[i]!r} vs {bv[i]!r}")
                ok = False
                break
    if ok:
        n_pass += 1
        print(f"PASS {name} ({len(a)} rows)")
    else:
        n_fail += 1

# rows-only queries (no oracle)
for p in sorted(glob.glob(f"{outdir}/*")):
    name = os.path.basename(p)
    if os.path.isdir(p) and name not in sqls:
        try:
            n = len(pd.read_parquet(p))
            print(f"ROWS {name}: {n} rows {'PASS' if n > 0 else 'FAIL-EMPTY'}")
            if n == 0: n_fail += 1
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")
            n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail / {len(sqls)} oracles")
sys.exit(1 if n_fail else 0)
