#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/localverify.py <sfDir> <verifyOutDir>

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run first.
Registers every parquet in sfDir as a DuckDB view named by basename, executes
each oracle_sql.json entry, and compares with the Spark-written parquet:
columns sorted by name, rows sorted by all columns, exact match on
ints/strings/timestamps, tolerance 1e-9 relative on floats (reported
separately from exact-hash match so we can see how close we are).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify timestamp precisions
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            pass
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    # dtype drift is a FAILURE, not a warning: the round-9 driver rejected 10
    # value-exact queries whose DuckDB twin left an uncast HUGEINT (pandas
    # object/float) where Spark emitted long/decimal — this local gate said
    # "OK" and let them ship. Only int64<->int32-style width pairs within the
    # same kind are tolerated (both hash identically via value repr).
    import datetime
    def kindof(col):
        s = str(col.dtype)
        if s.startswith("int") or s.startswith("uint"):
            return "i"
        if s.startswith("datetime64"):
            return "M"
        if s == "object":
            vals = col.dropna()
            # an all-NULL object column carries no kind evidence at all:
            # treat it as wildcard so a sparse date column paired with a
            # datetime64 twin doesn't hard-fail on dtype while every value
            # hashes equal (round-10 advice)
            if not len(vals):
                return "*"
            # Spark DATE parquet -> pandas object of datetime.date, DuckDB
            # DATE -> datetime64[us]: hash-equal in the driver (9 green r9
            # rows carry exactly this pairing), so same kind. Sample both
            # ends, not just the head — a column whose first 100 non-nulls
            # happen to be dates must not classify on that prefix alone.
            sample = list(vals.head(100)) + list(vals.tail(100))
            if all(isinstance(v, datetime.date) and
                   not isinstance(v, datetime.datetime)
                   for v in sample):
                return "M"
        return s
    def tolerated(ka, kb):
        # the all-NULL wildcard only covers the datetime pairing it was
        # added for (sparse date object column vs a datetime64 twin); any
        # other pairing — e.g. object-None vs float64-NaN from an uncast
        # HUGEINT — keeps the hard dtype failure (round-11 advice)
        return "*" in (ka, kb) and "M" in (ka, kb)
    dt = [c for c in a.columns if str(a[c].dtype) != str(b[c].dtype)
          and kindof(a[c]) != kindof(b[c])
          and not tolerated(kindof(a[c]), kindof(b[c]))]
    if dt:
        return ("DTYPE MISMATCH "
                f"{[(c, str(a[c].dtype), str(b[c].dtype)) for c in dt]}")
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    exact = True
    close = True
    detail = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                exact = False
                ok = np.isclose(av.fillna(0), bv.fillna(0), rtol=1e-9, atol=1e-9) | both_nan
                if not ok.all():
                    close = False
                    i = int(np.argmax(~ok))
                    detail.append(f"col {c} row {i}: spark={av.iloc[i]} duck={bv.iloc[i]}")
        else:
            try:
                eq = (av == bv) | (av.isna() & bv.isna())
            except Exception:
                eq = av.astype(str) == bv.astype(str)
            if not eq.all():
                exact = False; close = False
                i = int(np.argmax(~eq.values))
                detail.append(f"col {c} row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    if exact:
        return "OK exact"
    if close:
        return "OK close (float last-bits differ)"
    return "VALUE MISMATCH " + "; ".join(detail[:3])

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"{name:28s} MISSING spark output"); continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{spark_path}/*.parquet"))],
                                 ignore_index=True) if glob.glob(f"{spark_path}/*.parquet") else pd.DataFrame()
        except Exception as e:
            print(f"{name:28s} SPARK READ FAIL {e}"); continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} DUCKDB FAIL {str(e)[:200]}"); continue
        res = compare(name, spark_df, duck_df)
        if res.startswith("OK"): n_ok += 1
        print(f"{name:28s} {res}")
    print(f"\n{n_ok}/{len(oracle)} OK")

if __name__ == "__main__":
    main()
