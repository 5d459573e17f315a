#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name> parquet dir written by graft.Verify, runs the matching
oracle_sql.json entry in DuckDB over the sf_dir tables, normalizes both
(columns sorted by name, rows sorted by all columns) and compares.

REPRESENTATION-STRICT (NUMERIC_CONVENTION.md rule 10): the driver hashes
the rendered representation of each cell, so `1132541` (int64) and
`1132541.0` (float64) are DIFFERENT even when numerically equal. This
gate therefore:
  * FAILS (never coerces) when one side is integer-kind and the other
    float-kind for the same column;
  * compares DuckDB's NATIVE result types (pre-pandas, rel.types)
    against the Spark parquet schema for every oracle — HUGEINT or
    DECIMAL leaking out of an oracle's final SELECT, or an int32/int64
    width split, is a FAIL even when today's driver hash happens to
    tolerate it.
"""
import sys, json, glob, os, re
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq

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


def arrow_kind(t):
    """Normalize a pyarrow type to a (kind, width) tag."""
    s = str(t)
    if s in ("int8", "int16", "int32", "int64",
             "uint8", "uint16", "uint32", "uint64"):
        # parse the width with a regex: lstrip("uint") is a CHAR-SET
        # strip that only worked by coincidence (e.g. would eat the
        # '6' of a hypothetical suffix)
        return ("int", int(re.search(r"\d+", s).group()))
    if s == "float":  # arrow float32 prints as "float"
        return ("float", 32)
    if s in ("float32", "float64", "double", "halffloat"):
        return ("float", 64 if s in ("float64", "double") else 32)
    if s in ("string", "large_string", "utf8"):
        return ("str", 0)
    if s == "bool":
        return ("bool", 0)
    if s.startswith("date"):
        return ("date", 0)
    if s.startswith("timestamp"):
        return ("ts", 0)
    if s.startswith("decimal"):
        return ("decimal", s)
    if s.startswith("list") or s.startswith("large_list"):
        return ("list", s)
    return ("other", s)


def duck_kind(t):
    """Normalize a DuckDB type to the same (kind, width) tag space."""
    s = str(t).upper()
    if s == "BIGINT":
        return ("int", 64)
    if s in ("INTEGER", "INT"):
        return ("int", 32)
    if s == "SMALLINT":
        return ("int", 16)
    if s == "TINYINT":
        return ("int", 8)
    # unsigned types map to their TRUE widths: a UINTEGER oracle column
    # materializes as pandas uint32 and must not pass the width audit
    # against a Spark int64 column
    if s == "UBIGINT":
        return ("int", 64)
    if s == "UINTEGER":
        return ("int", 32)
    if s == "USMALLINT":
        return ("int", 16)
    if s == "UTINYINT":
        return ("int", 8)
    if s == "HUGEINT":
        return ("HUGEINT", 128)  # never matches arrow -> always flagged
    if s == "DOUBLE":
        return ("float", 64)
    if s in ("FLOAT", "REAL"):
        return ("float", 32)
    if s == "VARCHAR":
        return ("str", 0)
    if s == "BOOLEAN":
        return ("bool", 0)
    if s == "DATE":
        return ("date", 0)
    if s.startswith("TIMESTAMP"):
        return ("ts", 0)
    if s.startswith("DECIMAL"):
        return ("decimal", s)
    if s.endswith("[]") or s.startswith("LIST") or s.startswith("STRUCT"):
        return ("list", s)
    return ("other", s)


def native_dtype_audit(name, sql):
    """Compare DuckDB native result types vs Spark parquet schema.

    Returns a list of human-readable divergence strings (empty = clean).
    """
    rel = con.sql(sql)
    d = dict(zip(rel.columns, [duck_kind(t) for t in rel.types]))
    sch = pq.read_schema(
        glob.glob(f"{outdir}/{name}/*.parquet")[0])
    s = {f.name: arrow_kind(f.type) for f in sch
         if not f.name.startswith("_")}
    bad = []
    for c in sorted(set(d) & set(s)):
        dk, sk = d[c], s[c]
        if dk[0] == "HUGEINT":
            bad.append(f"{c}: oracle HUGEINT (pandas->float64) vs spark "
                       f"{sk} — add CAST(... AS BIGINT) in final SELECT")
        elif dk[0] == "list" and sk[0] == "list":
            pass  # element-type parity is covered by the value compare
        elif dk[0] != sk[0]:
            bad.append(f"{c}: oracle {dk} vs spark {sk} (kind mismatch)")
        elif dk[0] == "int" and dk[1] != sk[1]:
            bad.append(f"{c}: oracle int{dk[1]} vs spark int{sk[1]} "
                       f"(width mismatch — sweep to parity)")
        elif dk[0] == "decimal" and dk != sk:
            bad.append(f"{c}: oracle {dk[1]} vs spark {sk[1]}")
    return bad


INT_KINDS = "iu"
n_pass = n_fail = 0
for name in sorted(sqls):
    sql = sqls[name]
    try:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        dtype_bad = native_dtype_audit(name, sql)
        a = norm(pd.read_parquet(f"{outdir}/{name}"))
        b = norm(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        n_fail += 1
        continue
    if dtype_bad:
        for m in dtype_bad:
            print(f"FAIL {name}: DTYPE {m}")
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
        a_f = np.issubdtype(a[c].dtype, np.floating)
        b_f = np.issubdtype(b[c].dtype, np.floating)
        a_i = a[c].dtype.kind in INT_KINDS
        b_i = b[c].dtype.kind in INT_KINDS
        if (a_f and b_i) or (a_i and b_f):
            # The driver hashes the representation: 5 vs 5.0 is a FAIL.
            print(f"FAIL {name}: col {c} int-vs-float dtype "
                  f"({a[c].dtype} vs {b[c].dtype}) — representation "
                  f"hash would mismatch even if values are equal")
            ok = False
            break
        if a_f or b_f:
            av = av.astype(float); bv = bv.astype(float)
            bad = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            if bad.any():
                i = int(np.argmax(bad))
                print(f"FAIL {name}: col {c} differs, e.g. row {i}: "
                      f"{av[i]!r} vs {bv[i]!r} "
                      f"(maxdiff {np.nanmax(np.abs(av-bv))})")
                ok = False
                break
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                bad = av.astype(str) != bv.astype(str)
                i = int(np.argmax(bad))
                print(f"FAIL {name}: col {c} differs, e.g. row {i}: "
                      f"{av[i]!r} vs {bv[i]!r}")
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
