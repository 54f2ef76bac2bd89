"""Fast iteration: run only the named queries against their oracles.

Usage: python tools_check_keys.py q_tpch_q5 q_date_spine ...
Same bare-session + compare semantics as tools_drive_entry.py.
"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import os
import duckdb, pandas as pd

SF = os.environ.get("CK_SF_DIR", "/root/testdata/sf0.01")

spark = SparkSession.builder.master("local[8]").appName("key-check").getOrCreate()

import __spark_entry__ as e

q, o = e.queries(), e.oracle_sql()

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def norm(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(drop=True)


fails = []
for name in sys.argv[1:]:
    if name not in q:
        print(f"  {name}: NOT REGISTERED")
        fails.append(name)
        continue
    spdf = q[name](spark, SF).toPandas()
    if name in o:
        dpdf = con.execute(o[name]).fetchdf()
        a, b = norm(spdf), norm(dpdf)
        ok = (len(a) == len(b)) and list(a.columns) == list(b.columns) and a.equals(b)
        status = "MATCH" if ok else "MISMATCH"
        if not ok:
            fails.append(name)
            print("  spark:\n", a.head(5), "\n  dtypes:", dict(a.dtypes.astype(str)))
            print("  duck :\n", b.head(5), "\n  dtypes:", dict(b.dtypes.astype(str)))
    else:
        status = f"rows-only ({len(spdf)})"
    print(f"  {name:24s} {len(spdf):7d} rows  {status}")
print("FAILURES:", fails or "none")
