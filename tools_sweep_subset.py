"""Self-check a subset of queries() against oracle_sql() at one SF.

Usage: python tools_sweep_subset.py [key ...]   (no args = _SHOWCASE window)
Env:   SWEEP_SF=0.001|0.01|0.1   (default 0.01)
"""
import os
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb, pandas as pd

SF = os.environ.get("SWEEP_SF", "0.01")
SF_DIR = f"/root/testdata/sf{SF}"

spark = (SparkSession.builder.master("local[8]")
         .config("spark.driver.memory", "8g")
         .appName("sweep-subset").getOrCreate())

import __spark_entry__ as e

q = e.queries(); o = e.oracle_sql()
keys = sys.argv[1:] or e._SHOWCASE

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

def norm(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]): pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]): pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]): pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(drop=True)

fails = []
for name in keys:
    try:
        spdf = q[name](spark, SF_DIR).toPandas()
    except Exception as ex:
        print(f"  {name:24s} ERROR {ex}")
        fails.append(name); continue
    if name in o:
        dpdf = con.execute(o[name]).fetchdf()
        a, b = norm(spdf), norm(dpdf)
        ok = (len(a)==len(b)) and list(a.columns)==list(b.columns) and a.equals(b)
        status = "MATCH" if ok else "MISMATCH"
        if not ok: fails.append(name)
    else:
        status = f"rows-only ({len(spdf)})"
    print(f"  {name:24s} {len(spdf):7d} rows  {status}", flush=True)
print("FAILURES:", fails or "none")
