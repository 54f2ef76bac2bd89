"""Interleaved A/B: q_tfidf_top_terms current plan vs single-pass
(lang,term) aggregate + term-window df. Run: python tools_ab_tfidf.py
(paths derive from this file's location and $SPARK_GRAFT_SF_DIR, like
the other tools_ scripts — advice r11)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.adaptive.enabled","true")
         .config("spark.sql.session.timeZone","UTC")
         .getOrCreate())
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from lakehouse_app_spark.sources.tables import load_tables
from lakehouse_app_spark.operators.text import tokens
from lakehouse_app_spark import QUERIES

def v1(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    # one pass: doc-level tf rows are unique per (doc_id, term), and a
    # doc has exactly one lang -> df(term) = sum over langs of doc
    # counts; no second traversal of the explode, no countDistinct expand
    tfd = (
        t.documents.select("doc_id", "lang", F.explode(tokens()).alias("term"))
        .groupBy("doc_id", "lang", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    g = tfd.groupBy("lang", "term").agg(
        F.sum("tf").alias("stf"), F.count(F.lit(1)).alias("ndocs_lt")
    )
    n_docs = t.documents.agg(F.count(F.lit(1)).alias("n_docs"))
    wterm = Window.partitionBy("term")
    scored = (
        g.crossJoin(F.broadcast(n_docs))
        .withColumn("df", F.sum("ndocs_lt").over(wterm))
        .select(
            "lang", "term",
            F.round(F.col("stf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("lang", "term", "tfidf", "rank")
    )

def timeit(fn):
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.time()-t0, 3)

cur = lambda: QUERIES["q_tfidf_top_terms"](spark, SF)
new = lambda: v1(spark, SF)

# hash equality first
a = cur().toPandas().sort_values(["lang","rank"]).reset_index(drop=True)
b = new().toPandas().sort_values(["lang","rank"]).reset_index(drop=True)
print("identical:", a.equals(b))
if not a.equals(b):
    print(a.compare(b)); sys.exit(1)

ra, rb = [], []
for i in range(4):
    ra.append(timeit(cur)); rb.append(timeit(new))
print("current:", ra, "min", min(ra))
print("v1     :", rb, "min", min(rb))
