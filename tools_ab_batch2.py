"""Interleaved A/B, r14 batch 2: duplicated-subtree eliminations in
q_skew_stats / q_bm25 / q_tfidf_top_terms / q_pmi_collocations /
q_change_feed. OLD arms are the pre-r14 forms reconstructed inline;
NEW arms are the committed queries. Reps alternate OLD/NEW in one
process (the BASELINE.md within-run protocol), min-of-5 per arm.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

import lakehouse_app_spark as eng
from lakehouse_app_spark.operators.text_pipeline import (
    B,
    BM25_TERMS,
    K1,
    PMI_MIN_COUNT,
    PMI_TOP,
)
from lakehouse_app_spark.operators.text import tokens
from lakehouse_app_spark.sources.sinks import read_snapshot
from lakehouse_app_spark.sources.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("ITERS", "5"))


def old_skew_stats(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    per_key = t.lineitem.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_rows"),
        F.round(F.avg("n"), 6).alias("avg_rows"),
        F.round(F.max("n") / F.avg("n"), 6).alias("skew_factor"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_rows"),
        F.avg("n").alias("_avg_raw"),
    )
    hot = (
        per_key.crossJoin(F.broadcast(stats.select("_avg_raw")))
        .where(F.col("n") > 2 * F.col("_avg_raw"))
        .agg(F.count(F.lit(1)).alias("n_hot_keys"))
    )
    return stats.drop("_avg_raw").crossJoin(F.broadcast(hot))


def old_bm25(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ts")
    )
    dl = tok.select("doc_id", F.size("ts").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.select(
            "doc_id",
            F.size("ts").cast("bigint").alias("dl"),
            F.explode("ts").alias("w"),
        )
        .where(F.col("w").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    tf_norm = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(F.broadcast(stats))
        .select("doc_id", (idf * tf_norm).alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


def old_tfidf(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    tf = (
        t.documents.select("doc_id", "lang", F.explode(tokens()).alias("term"))
        .groupBy("doc_id", "lang", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = t.documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("lang", "term", "n_docs", "df")
        .agg(
            F.round(
                F.sum("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf")
        )
        .drop("n_docs", "df")
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("lang", "term", "tfidf", "rank")
    )


def old_pmi(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    tk = F.split(F.lower(F.col("text")), " ")
    docs = t.documents.select(tk.alias("tk"))
    uni = (
        docs.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 1),
        lambda i: F.struct(
            F.element_at("tk", i.cast("int")).alias("w1"),
            F.element_at("tk", (i + 1).cast("int")).alias("w2"),
        ),
    )
    bi = (
        docs.where(F.size("tk") >= 2)
        .select(F.explode(pairs).alias("s"))
        .groupBy(F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nu = uni.agg(F.sum("c1").cast("double").alias("n_uni"))
    nb = bi.agg(F.sum("c").cast("double").alias("n_bi"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1a"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1b"))
    pmi = F.log(
        (F.col("c") / F.col("n_bi"))
        / ((F.col("c1a") / F.col("n_uni")) * (F.col("c1b") / F.col("n_uni")))
    )
    return (
        bi.where(F.col("c") >= PMI_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1", "w2", F.col("c").cast("long").alias("c"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP)
    )


def old_change_feed(spark, sf_dir):
    """q_change_feed with the pre-r14 union-per-role builder (middle
    versions scanned twice) inlined."""
    from lakehouse_app_spark.operators.lake_ops import _cdc_docs_lineage

    path = _cdc_docs_lineage(spark, sf_dir)
    v_from, v_to, key_col, payload_cols = 0, 3, "doc_id", ["source", "n_chars"]
    frames = []
    for v in range(v_from, v_to + 1):
        snap = read_snapshot(spark, path, v).select(
            F.col(key_col).alias("_k"), F.struct(*payload_cols).alias("_p")
        )
        if v > v_from:
            frames.append(
                snap.select(
                    "_k",
                    F.lit(v).alias("commit_version"),
                    F.lit("n").alias("_role"),
                    "_p",
                )
            )
        if v < v_to:
            frames.append(
                snap.select(
                    "_k",
                    F.lit(v + 1).alias("commit_version"),
                    F.lit("o").alias("_role"),
                    "_p",
                )
            )
    u = frames[0]
    for f in frames[1:]:
        u = u.unionByName(f)
    g = u.groupBy("_k", "commit_version").agg(
        F.max(F.when(F.col("_role") == "o", F.col("_p"))).alias("_op"),
        F.max(F.when(F.col("_role") == "n", F.col("_p"))).alias("_np"),
        F.count(F.when(F.col("_role") == "o", 1)).alias("_no"),
        F.count(F.when(F.col("_role") == "n", 1)).alias("_nn"),
    )
    g = g.where(
        F.assert_true(
            (F.col("_no") <= 1) & (F.col("_nn") <= 1),
            F.lit("change_feed: key not unique within a version"),
        ).isNull()
    )
    # tail identical to the committed change_feed (only the head's
    # union-per-role scan duplication is under test)
    chg = (
        F.when(
            F.col("_op").isNull(),
            F.array(
                F.struct(
                    F.col("_np").alias("p"), F.lit("insert").alias("change_type")
                )
            ),
        )
        .when(
            F.col("_np").isNull(),
            F.array(
                F.struct(
                    F.col("_op").alias("p"), F.lit("delete").alias("change_type")
                )
            ),
        )
        .when(
            ~F.col("_op").eqNullSafe(F.col("_np")),
            F.array(
                F.struct(
                    F.col("_op").alias("p"),
                    F.lit("update_preimage").alias("change_type"),
                ),
                F.struct(
                    F.col("_np").alias("p"),
                    F.lit("update_postimage").alias("change_type"),
                ),
            ),
        )
        .otherwise(F.array())
    )
    return (
        g.select("_k", "commit_version", F.explode(chg).alias("_c"))
        .select(
            F.col("_k").alias(key_col),
            *[F.col(f"_c.p.{c}").alias(c) for c in payload_cols],
            F.col("_c.change_type").alias("change_type"),
            "commit_version",
        )
    )


def main() -> None:
    eng.load_all_queries()
    spark = eng.get_spark(app_name="ab-batch2")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    cases = {
        "q_skew_stats": old_skew_stats,
        "q_bm25": old_bm25,
        "q_tfidf_top_terms": old_tfidf,
        "q_pmi_collocations": old_pmi,
        "q_change_feed": old_change_feed,
    }
    out = {}
    for name, old_fn in cases.items():
        new_fn = eng.QUERIES[name]
        olds, news = [], []
        for fn in (old_fn, new_fn):  # warm codegen once per arm
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            eng.release_caches()
        for _ in range(REPS):
            for fn, sink in ((old_fn, olds), (new_fn, news)):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                sink.append(round(time.perf_counter() - t0, 3))
                eng.release_caches()
        out[name] = {
            "old_min": min(olds), "new_min": min(news),
            "old": olds, "new": news,
        }
        print(name, out[name], file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
