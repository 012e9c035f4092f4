#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Reads each <outdir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outdir>/oracle_sql.json in DuckDB over views of
the <sfdir> parquet tables, and compares schema (sorted column names),
row count, and exact values.

NOT part of the Scala library — development tooling only (duckdb/pandas
are driver-side deps).
"""
import duckdb, json, sys, os
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype).startswith("int"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
            exp = con.execute(sql).fetchdf()
            got, exp = canon(got), canon(exp)
            if list(got.columns) != list(exp.columns):
                raise AssertionError(f"schema {list(got.columns)} != {list(exp.columns)}")
            if len(got) != len(exp):
                raise AssertionError(f"rows {len(got)} != {len(exp)}")
            if not got.equals(exp):
                diff_cols = [c for c in got.columns if not got[c].equals(exp[c])]
                mask = pd.Series(False, index=got.index)
                for c in diff_cols:
                    mask |= ~(got[c].eq(exp[c]) | (got[c].isna() & exp[c].isna()))
                raise AssertionError(
                    f"values differ in {diff_cols} ({int(mask.sum())} rows), e.g.\n"
                    f"got:\n{got[mask].head(3)}\nexp:\n{exp[mask].head(3)}")
            print(f"  OK   {name} ({len(got)} rows)")
            n_ok += 1
        except Exception as e:
            print(f"  FAIL {name}: {e}")
            failed.append(name)
    print(f"{n_ok}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
