#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, sorts columns by name and rows by all columns,
and compares values. Exit 1 on any mismatch.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = pd.to_numeric(a[c]).values.astype(float)
            bv = pd.to_numeric(b[c]).values.astype(float)
            bad = ~(np.isclose(av, bv, rtol=0, atol=1e-12) | (pd.isna(av) & pd.isna(bv)))
            exact = np.array_equal(av, bv, equal_nan=True)
            if bad.any():
                i = int(np.argmax(bad))
                return f"VALUE col={c} row={i}: {av[i]!r} vs {bv[i]!r}"
            if not exact:
                i = int(np.argmax(av != bv))
                print(f"  [warn] {name}.{c}: not bit-exact (row {i}: {av[i]!r} vs {bv[i]!r})")
        else:
            av = a[c].astype(str).values
            bv = b[c].astype(str).values
            if not np.array_equal(av, bv):
                i = int(np.argmax(av != bv))
                return f"VALUE col={c} row={i}: {av[i]!r} vs {bv[i]!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    dirs = {os.path.basename(d.rstrip("/")): d
            for d in sorted(glob.glob(f"{out_dir}/*/"))}
    for name in sorted(set(dirs) | set(oracles)):
        if name not in dirs:
            print(f"FAIL  {name}: no verify output written")
            n_fail += 1
            continue
        d = dirs[name]
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
            ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            print(f"SKIP  {name} (rows-only: {len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL  {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
