"""Interleaved A/B for the r15 batch-1 rewrites, old vs new in ONE
process (reps alternate arms so host-window drift hits both equally):

  pq      — q_pq_quantize argmin: min(struct(dist,cid)) [SortAggregate]
            vs min(encoded long) [HashAggregate]
  corpus  — q_corpus_pipeline: 4-scan stage-join composition vs the
            fused single-scan expression composition

Prints min/median per arm. Timing = noop sink, bench protocol.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng
from pyspark.sql import functions as F, Window

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

eng.load_all_queries()
spark = eng.get_spark(app_name="ab-r15-batch1")
spark.sparkContext.setLogLevel("ERROR")


def old_pq(spark, sf_dir):
    from lakehouse_app_spark.operators.ann import (
        PQ_DSUB, PQ_K, PQ_M, as_double_array,
    )
    from lakehouse_app_spark.sources.tables import load_tables

    t = load_tables(spark, sf_dir)
    sub = lambda c, j: F.slice(c, j * PQ_DSUB + 1, PQ_DSUB)  # noqa: E731
    cents = t.embeddings.where(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), as_double_array("embedding").alias("cvec")
    )
    jseq = F.sequence(F.lit(0), F.lit(PQ_M - 1))
    subc = cents.select(
        "cid",
        F.explode(
            F.transform(
                jseq,
                lambda j: F.struct(j.alias("j"), sub(F.col("cvec"), j).alias("csub")),
            )
        ).alias("s"),
    ).select("cid", F.col("s.j").alias("j"), F.col("s.csub").alias("csub"))
    subv = t.embeddings.select(
        "vec_id",
        F.explode(
            F.transform(
                jseq,
                lambda j: F.struct(
                    j.alias("j"), sub(as_double_array("embedding"), j).alias("vsub")
                ),
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.j").alias("j"), F.col("s.vsub").alias("vsub"))
    dist = F.round(
        F.aggregate(
            F.zip_with(F.col("vsub"), F.col("csub"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    d = subv.join(F.broadcast(subc), "j").select(
        "vec_id", "j", "cid", dist.alias("dist")
    )
    best = d.groupBy("vec_id", "j").agg(F.min(F.struct("dist", "cid")).alias("b"))
    return best.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(b.cid, CAST(4 * j AS INT))")).cast("long").alias("pq_code"),
        F.sum(F.col("b.dist").cast("decimal(25,6)")).cast("double").alias("recon_err"),
    )


def old_corpus(spark, sf_dir):
    from lakehouse_app_spark.operators.corpus_prep import q_corpus_gate
    from lakehouse_app_spark.operators.dedup import rep_docs, spread
    from lakehouse_app_spark.operators.quality import q_quality_classifier
    from lakehouse_app_spark.sources.tables import load_tables

    t = load_tables(spark, sf_dir)
    gate_keep = q_corpus_gate(spark, sf_dir).where("keep").select("doc_id")
    clf_keep = q_quality_classifier(spark, sf_dir).where("keep").select("doc_id")
    reps = rep_docs(spread(t.documents)).select("doc_id")
    hex8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    u = (F.conv(hex8, 16, 10).cast("double") + 1) / F.lit(4294967297.0)
    split = F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    kept = (
        t.documents.join(gate_keep, "doc_id")
        .join(clf_keep, "doc_id")
        .join(reps, "doc_id")
        .select(
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        )
    )
    return kept.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )


PAIRS = {
    "pq": (old_pq, eng.QUERIES["q_pq_quantize"]),
    "corpus": (old_corpus, eng.QUERIES["q_corpus_pipeline"]),
}


def run(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    from lakehouse_app_spark.runtime_cache import release_caches

    names = sys.argv[1:] or list(PAIRS)
    for name in names:
        old_b, new_b = PAIRS[name]
        # warm both arms once (plan compile, layout build)
        run(old_b(spark, SF_DIR)); release_caches()
        run(new_b(spark, SF_DIR)); release_caches()
        olds, news = [], []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"ab {name} old")
            olds.append(run(old_b(spark, SF_DIR))); release_caches()
            spark.sparkContext.setJobDescription(f"ab {name} new")
            news.append(run(new_b(spark, SF_DIR))); release_caches()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: old min={min(olds):.3f} med={statistics.median(olds):.3f} "
            f"| new min={min(news):.3f} med={statistics.median(news):.3f} "
            f"| reps old={[round(x,3) for x in olds]} new={[round(x,3) for x in news]}"
        )


if __name__ == "__main__":
    main()
