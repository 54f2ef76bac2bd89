"""Config-invariance sweep: the full driver-contract comparison under
a PERTURBED vanilla session (local[4], ANSI off, shuffle.partitions=7
— none of our preferred confs), so no query's correctness depends on
the engine's own defaults. Same compare semantics as
tools_drive_entry.py."""
import os
import sys

sys.path.insert(0, "/root/repo")
SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
from pyspark.sql import SparkSession

import duckdb
import pandas as pd

spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver-sim-perturbed")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.shuffle.partitions", "7")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

q, o = e.queries(), e.oracle_sql()
print(f"{len(q)} queries under perturbed session", flush=True)

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
    return pdf.sort_values(
        by=list(pdf.columns), na_position="last"
    ).reset_index(drop=True)


fails = []
for name in sorted(q):
    try:
        spdf = q[name](spark, SF).toPandas()
    except Exception as ex:
        print(f"  {name:24s} ERROR {str(ex)[:120]}", flush=True)
        fails.append(name)
        continue
    if name in o:
        dpdf = con.execute(o[name]).fetchdf()
        a, b = norm(spdf), norm(dpdf)
        ok = (
            len(a) == len(b)
            and list(a.columns) == list(b.columns)
            and a.equals(b)
        )
        status = "MATCH" if ok else "MISMATCH"
        if not ok:
            fails.append(name)
    else:
        status = f"rows-only ({len(spdf)})"
    print(f"  {name:24s} {len(spdf):7d} rows  {status}", flush=True)
print("FAILURES:", fails or "none")
