"""Simulate the driver: vanilla SparkSession + __spark_entry__ contract."""
import os
import sys
sys.path.insert(0, "/root/repo")
SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
from pyspark.sql import SparkSession
import duckdb, pandas as pd

# deliberately bare session: no nanosAsLong, no UTC, default shuffle parts
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows))
for r in rows: print("  ", r.asDict())

q = e.queries(); o = e.oracle_sql()
print(f"{len(q)} queries, {len(o)} oracles")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]): pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]): pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]): pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(drop=True)

fails = []
for name in sorted(q):
    spdf = q[name](spark, SF).toPandas()
    if name in o:
        dpdf = con.execute(o[name]).fetchdf()
        a, b = norm(spdf), norm(dpdf)
        ok = (len(a)==len(b)) and list(a.columns)==list(b.columns) and a.equals(b)
        status = "MATCH" if ok else "MISMATCH"
        if not ok: fails.append(name)
    else:
        status = f"rows-only ({len(spdf)})"
    print(f"  {name:24s} {len(spdf):7d} rows  {status}")
print("FAILURES:", fails or "none")
