"""Interleaved A/B: q_knn_classify brute-force (r4 design) vs
IVF-routed (r10 design) at sf0.1, min-of-3 per arm, arms alternated
within one session (bench-host-noise protocol). Layout pre-built once
(bench ordering guarantees the same: q_ann_* precede q_knn_*)."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F

import lakehouse_app_spark as eng

SF = "/root/testdata/sf0.1"
spark = eng.get_spark(app_name="ab-knn")
spark.sparkContext.setLogLevel("ERROR")
eng.load_all_queries()

from lakehouse_app_spark.operators.ann import (
    KM_ITERS,
    N_CENTROIDS,
    ivf_index,
)
from lakehouse_app_spark.operators.vectors import _pair_sim, _sides
from lakehouse_app_spark.sources.tables import load_tables

ivf_index(spark, SF, "ivf8", N_CENTROIDS, KM_ITERS)  # pre-build layout


def old_brute(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    corpus = _sides(t.embeddings.where(F.col("vec_id") % 5 != 0), "b")
    queries = _sides(t.embeddings.where(F.col("vec_id") % 5 == 0), "a")
    pairs = (
        corpus.repartition(npart)
        .join(F.broadcast(queries))
        .select(
            F.col("a_id").alias("qid"),
            F.col("a_label").alias("true_label"),
            F.col("b_id").alias("cid"),
            F.col("b_label").alias("label"),
            _pair_sim().alias("sim"),
        )
    )
    w5 = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    top = pairs.withColumn("rn", F.row_number().over(w5)).where(F.col("rn") <= 5)
    votes = top.groupBy("qid", "true_label", "label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("qid").orderBy(F.col("votes").desc(), F.col("label"))
    return (
        votes.withColumn("r", F.row_number().over(wv))
        .where(F.col("r") == 1)
        .select(
            "qid",
            F.col("label").alias("pred_label"),
            "votes",
            "true_label",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


def run(fn):
    t0 = time.perf_counter()
    fn(spark, SF).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    eng.release_caches()
    return dt


new_ivf = eng.QUERIES["q_knn_classify"]
# warm both once
run(old_brute); run(new_ivf)
olds, news = [], []
for i in range(3):
    olds.append(run(old_brute))
    news.append(run(new_ivf))
print("old brute reps:", [round(x, 3) for x in olds], "min", round(min(olds), 3))
print("new ivf   reps:", [round(x, 3) for x in news], "min", round(min(news), 3))
