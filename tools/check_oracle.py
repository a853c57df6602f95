#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's dumped
oracle_sql.json in DuckDB over the same sf dir and diff against the Spark
parquet output (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name in sorted(glob.glob(f"{out}/q*")):
    qname = name.split("/")[-1]
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{name}/*.parquet')").fetchdf()
    if qname not in oracle:
        print(f"{qname}: rows-only ({len(spark_df)} rows)")
        continue
    duck_df = con.execute(oracle[qname]).fetchdf()
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s, d = canon(spark_df), canon(duck_df)
    schema_ok = list(s.columns) == list(d.columns)
    rows_ok = len(s) == len(d)
    vals_ok = schema_ok and rows_ok and s.equals(d)
    if not vals_ok and schema_ok and rows_ok:
        # tolerate dtype-only mismatches (e.g. int32 vs int64 from pandas)
        try:
            vals_ok = s.astype(str).equals(d.astype(str))
            if vals_ok:
                vals_ok = "weak-str-eq"
        except Exception:
            pass
    status = "OK" if vals_ok else "MISMATCH"
    if not vals_ok:
        fail += 1
    print(f"{qname}: {status} (spark={len(s)} duck={len(d)} rows, "
          f"schema_ok={schema_ok})")
    if not vals_ok:
        print("  spark cols:", dict(s.dtypes.astype(str)))
        print("  duck  cols:", dict(d.dtypes.astype(str)))
        if schema_ok and rows_ok:
            neq = (s != d) & ~(s.isna() & d.isna())
            bad = neq.any(axis=1)
            print("  first diffs:\n", s[bad].head(3), "\n  vs\n", d[bad].head(3))
        else:
            print("  spark head:\n", s.head(3), "\n  duck head:\n", d.head(3))
sys.exit(1 if fail else 0)
