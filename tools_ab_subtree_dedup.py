"""Interleaved A/B: duplicated-subtree elimination (r14).

OLD = the pre-r14 aggregate-and-broadcast-back forms of q_drift_ks /
q_drift_psi / q_mutual_info (reconstructed inline below); NEW = the
committed window-total / persisted-contingency forms. Reps alternate
OLD/NEW inside one process so host-window drift hits both arms
equally (the BASELINE.md within-run protocol). min-of-5 per arm.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import lakehouse_app_spark as eng
from lakehouse_app_spark.operators.quality import KS_ALPHA_C, PSI_BINS, PSI_SMOOTH
from lakehouse_app_spark.runtime_cache import scoped_persist
from lakehouse_app_spark.sources.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("ITERS", "5"))


def old_drift_ks(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tagged = t.orders.select(
        F.col("o_orderpriority").alias("category"),
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderkey") % 2).alias("split"),
    )
    vals = tagged.groupBy("category", "v").agg(
        F.count_if(F.col("split") == 0).alias("na"),
        F.count_if(F.col("split") == 1).alias("nb"),
    )
    tot = vals.groupBy("category").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    w = (
        Window.partitionBy("category")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = vals.join(F.broadcast(tot), "category").select(
        "category", "ta", "tb",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    )
    ks = cdf.groupBy("category", "ta", "tb").agg(
        F.max(
            F.abs(
                F.col("ca").cast("double") / F.col("ta").cast("double")
                - F.col("cb").cast("double") / F.col("tb").cast("double")
            )
        ).alias("d")
    )
    crit = F.round(
        F.lit(KS_ALPHA_C)
        * F.sqrt(
            (F.col("ta") + F.col("tb")).cast("double")
            / (F.col("ta") * F.col("tb")).cast("double")
        ),
        6,
    )
    d6 = F.round(F.col("d"), 6)
    return ks.select(
        "category",
        F.col("ta").alias("n_a"),
        F.col("tb").alias("n_b"),
        d6.alias("ks_stat"),
        crit.alias("ks_crit"),
        (d6 > crit).alias("drifted"),
    )


def old_drift_psi(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tagged = t.orders.select(
        F.col("o_orderpriority").alias("category"),
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderkey") % 2).alias("split"),
    )
    ref = (
        tagged.where(F.col("split") == 0)
        .groupBy("category")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    )
    raw_bin = F.floor(
        ((F.col("v") - F.col("mn")) * F.lit(float(PSI_BINS)))
        / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
    ).cast("bigint")
    bin_ = F.coalesce(
        F.least(F.lit(PSI_BINS - 1), F.greatest(F.lit(0), raw_bin)),
        F.lit(0),
    ).cast("bigint")
    bc = (
        tagged.join(F.broadcast(ref), "category")
        .select("category", bin_.alias("bin"), "split")
        .groupBy("category", "bin")
        .agg(
            F.count_if(F.col("split") == 0).alias("na"),
            F.count_if(F.col("split") == 1).alias("nb"),
        )
    )
    tot = bc.groupBy("category").agg(
        F.sum("na").alias("ta"),
        F.sum("nb").alias("tb"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    sm = F.lit(PSI_SMOOTH)
    nbins_d = F.col("n_bins").cast("double")
    pa = (F.col("na").cast("double") + sm) / (
        F.col("ta").cast("double") + sm * nbins_d
    )
    pb = (F.col("nb").cast("double") + sm) / (
        F.col("tb").cast("double") + sm * nbins_d
    )
    terms = bc.join(F.broadcast(tot), "category").select(
        "category", "ta", "tb", "n_bins",
        ((pa - pb) * F.log(pa / pb)).alias("term"),
    )
    psi = F.round(F.sum("term"), 6)
    return terms.groupBy("category", "ta", "tb", "n_bins").agg(
        psi.alias("psi")
    ).select(
        "category",
        F.col("ta").alias("n_ref"),
        F.col("tb").alias("n_cur"),
        "n_bins",
        "psi",
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate")
        .otherwise("major")
        .alias("status"),
    )


def old_mutual_info(spark, sf_dir) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pairs = t.documents.select(
        F.lit("documents:lang~source").alias("feature_pair"),
        F.col("lang").alias("x"),
        F.col("source").alias("y"),
    ).unionByName(
        t.orders.select(
            F.lit("orders:priority~status").alias("feature_pair"),
            F.col("o_orderpriority").alias("x"),
            F.col("o_orderstatus").alias("y"),
        )
    )
    joint = pairs.groupBy("feature_pair", "x", "y").agg(
        F.count(F.lit(1)).alias("c")
    )
    mx = joint.groupBy("feature_pair", "x").agg(F.sum("c").alias("cx"))
    my = joint.groupBy("feature_pair", "y").agg(F.sum("c").alias("cy"))
    tot = joint.groupBy("feature_pair").agg(F.sum("c").alias("n"))
    jd = (
        joint.join(F.broadcast(mx), ["feature_pair", "x"])
        .join(F.broadcast(my), ["feature_pair", "y"])
        .join(F.broadcast(tot), "feature_pair")
    )
    c_d, n_d = F.col("c").cast("double"), F.col("n").cast("double")
    mi = jd.groupBy("feature_pair", "n").agg(
        F.sum(
            (c_d / n_d)
            * F.log(
                c_d * n_d
                / (F.col("cx").cast("double") * F.col("cy").cast("double"))
            )
        ).alias("mi_nats"),
        F.count(F.lit(1)).alias("n_cells"),
    )

    def _entropy(marg, cnt, out):
        p = F.col(cnt).cast("double") / F.col("n").cast("double")
        return (
            marg.join(F.broadcast(tot), "feature_pair")
            .groupBy("feature_pair")
            .agg((-F.sum(p * F.log(p))).alias(out))
        )

    hx = _entropy(mx, "cx", "h_x")
    hy = _entropy(my, "cy", "h_y")
    return (
        mi.join(F.broadcast(hx), "feature_pair")
        .join(F.broadcast(hy), "feature_pair")
        .select(
            "feature_pair", "n", "n_cells",
            F.round("mi_nats", 6).alias("mi_nats"),
            F.round("h_x", 6).alias("h_x"),
            F.round("h_y", 6).alias("h_y"),
            F.round(
                F.col("mi_nats")
                / F.nullif(F.least("h_x", "h_y"), F.lit(0.0)),
                6,
            ).alias("nmi"),
        )
    )


def main() -> None:
    eng.load_all_queries()
    spark = eng.get_spark(app_name="ab-subtree-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    cases = {
        "q_drift_ks": old_drift_ks,
        "q_drift_psi": old_drift_psi,
        "q_mutual_info": old_mutual_info,
    }
    out = {}
    for name, old_fn in cases.items():
        new_fn = eng.QUERIES[name]
        olds, news = [], []
        # warm both arms once (codegen compile), then alternate
        for fn in (old_fn, new_fn):
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
