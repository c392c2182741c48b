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
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB result-column type -> equivalence class; the Spark parquet schema
# (arrow types) maps into the same classes. A class mismatch is a driver-side
# hash divergence even when values compare equal (r14: 7 queries red ONLY at
# the driver because sum(BIGINT) widens to HUGEINT in DuckDB).
BANNED_DUCK = ("HUGEINT", "UHUGEINT", "INT128", "DECIMAL")
DUCK_CLASS = {
    "BOOLEAN": "bool", "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
    "BIGINT": "int", "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "UBIGINT": "int", "FLOAT": "float", "DOUBLE": "float", "VARCHAR": "str",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
}
def arrow_class(t):
    s = str(t)
    if s.startswith(("int", "uint")): return "int"
    if s.startswith(("float", "double", "halffloat")): return "float"
    if s in ("string", "large_string", "utf8"): return "str"
    if s.startswith("timestamp"): return "ts"
    if s.startswith("date"): return "date"
    if s == "bool": return "bool"
    return s

def type_check(name, duck_rel, spark_files):
    """Fail on DuckDB types the driver's hash cannot match (HUGEINT/DECIMAL)
    and on any class mismatch vs the Spark parquet result schema."""
    duck_types = dict(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
    errs = [f"oracle col {c} has banned DuckDB type {t}"
            for c, t in duck_types.items() if any(b in t.upper() for b in BANNED_DUCK)]
    schema = pq.read_schema(sorted(spark_files)[0])
    spark_types = {f.name: arrow_class(f.type) for f in schema}
    # DATE and TIMESTAMP both land as datetime64 in the driver's pandas
    # compare (ql01 is driver-green with duck DATE vs spark timestamp);
    # int-vs-float or int-vs-HUGEINT do NOT normalize — those fail.
    def canon(cl): return "ts" if cl == "date" else cl
    for c, t in duck_types.items():
        dc = DUCK_CLASS.get(t.upper())
        sc = spark_types.get(c)
        if dc is not None and sc is not None and canon(dc) != canon(sc):
            errs.append(f"col {c}: duck {t} ({dc}) vs spark {sc}")
    return errs

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
            rel = con.sql(oracle[name])
            terrs = type_check(name, rel, files)
            duck_df = rel.fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}"); n_bad += 1; continue
        if terrs:
            print(f"FAIL  {name}: TYPE {'; '.join(terrs)}"); n_bad += 1; continue
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
