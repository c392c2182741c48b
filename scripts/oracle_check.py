#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run
the matching SQL from oracle_sql.json in DuckDB (tables = parquet views of
sfDir), sort columns by name, sort rows, compare cell values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # unify datetime64[us] vs [ns] (NaT-safe compare)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_bad += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"rows-only  {name}: {len(spark_df)} rows"); n_noracle += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}"); n_bad += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL  {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
            n_bad += 1; continue
        if len(s) != len(d):
            print(f"FAIL  {name}: rows spark={len(s)} duck={len(d)}"); n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
            print(f"OK    {name} ({len(s)} rows)"); n_ok += 1
        except AssertionError as e:
            msg = str(e).splitlines()[0:4]
            print(f"FAIL  {name}: {' | '.join(msg)}")
            # show first differing rows
            neq = (s != d) & ~(s.isna() & d.isna())
            bad_rows = neq.any(axis=1)
            print(s[bad_rows].head(3)); print(d[bad_rows].head(3))
            n_bad += 1
    print(f"\n{n_ok} OK, {n_bad} FAIL, {n_noracle} rows-only")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
