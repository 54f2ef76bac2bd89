"""Interleaved A/B for q_bootstrap_ci's replicate amplification at
sf0.1: (A) current explode(sequence) — the r8 winner; (B) crossJoin
against a broadcast 32-row replicate table; (C) explode with the
key-dependent hash prefactor precomputed BEFORE amplification.
Min-of-3 per arm, arms rotated within one session."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

import lakehouse_app_spark as eng

SF = "/root/testdata/sf0.1"
spark = eng.get_spark(app_name="ab-boot")
spark.sparkContext.setLogLevel("ERROR")
eng.load_all_queries()

from lakehouse_app_spark.operators.analytics import (
    BOOT_R,
    _BOOT_A,
    _BOOT_B,
    _BOOT_P,
    _POIS_T,
)
from lakehouse_app_spark.sources.tables import load_tables


def _w(hcol):
    w = None
    for thr in _POIS_T:
        term = F.when(hcol >= thr, 1).otherwise(0)
        w = term if w is None else (w + term)
    return w


def _finish(reps_with_w, t):
    rm = reps_with_w.groupBy("category", "r").agg(
        (
            F.sum(F.col("w") * F.col("yc")).cast("double")
            / F.lit(100.0)
            / F.sum("w").cast("double")
        ).alias("m")
    )
    fm = t.orders.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(
                (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("long")
            ).cast("double")
            / F.lit(100.0)
            / F.count(F.lit(1)).cast("double")
        ).alias("mean"),
    )
    ci = rm.groupBy("category").agg(
        F.expr("round(percentile_disc(0.025) WITHIN GROUP (ORDER BY m), 6)").alias("ci_lo"),
        F.expr("round(percentile_disc(0.975) WITHIN GROUP (ORDER BY m), 6)").alias("ci_hi"),
    )
    return fm.join(ci, "category").select(
        "category", "n", F.round("mean", 6).alias("mean"), "ci_lo", "ci_hi"
    )


def base(t):
    return t.orders.select(
        F.col("o_orderpriority").alias("category"),
        (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("long").alias("yc"),
        "o_orderkey",
    )


def variant_a(spark, sf_dir):  # current: explode(sequence), hash post-explode
    t = load_tables(spark, sf_dir)
    reps = base(t).select(
        "category", "yc", "o_orderkey",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_R - 1))).alias("r"),
    ).withColumn(
        "h",
        (F.lit(_BOOT_A) * (((F.col("o_orderkey") % _BOOT_P) * BOOT_R + F.col("r")) % _BOOT_P) + F.lit(_BOOT_B)) % F.lit(_BOOT_P),
    )
    return _finish(reps.withColumn("w", _w(F.col("h"))), t)


def variant_b(spark, sf_dir):  # broadcast 32-row cross join
    t = load_tables(spark, sf_dir)
    rr = spark.range(BOOT_R).select(F.col("id").cast("int").alias("r"))
    reps = base(t).join(F.broadcast(rr)).withColumn(
        "h",
        (F.lit(_BOOT_A) * (((F.col("o_orderkey") % _BOOT_P) * BOOT_R + F.col("r")) % _BOOT_P) + F.lit(_BOOT_B)) % F.lit(_BOOT_P),
    )
    return _finish(reps.withColumn("w", _w(F.col("h"))), t)


def variant_c(spark, sf_dir):  # kr precomputed pre-explode
    t = load_tables(spark, sf_dir)
    reps = (
        base(t)
        .withColumn("kr", (F.col("o_orderkey") % _BOOT_P) * BOOT_R)
        .select(
            "category", "yc", "kr",
            F.explode(F.sequence(F.lit(0), F.lit(BOOT_R - 1))).alias("r"),
        )
        .withColumn(
            "h",
            (F.lit(_BOOT_A) * ((F.col("kr") + F.col("r")) % _BOOT_P) + F.lit(_BOOT_B)) % F.lit(_BOOT_P),
        )
    )
    return _finish(reps.withColumn("w", _w(F.col("h"))), t)


def run(fn):
    t0 = time.perf_counter()
    fn(spark, SF).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    eng.release_caches()
    return dt


# hash-identity check first: all three variants must collect equal rows
ref = sorted(map(tuple, variant_a(spark, SF).collect()))
for name, fn in (("B", variant_b), ("C", variant_c)):
    got = sorted(map(tuple, fn(spark, SF).collect()))
    print(f"variant {name} identical: {got == ref}")

for fn in (variant_a, variant_b, variant_c):
    run(fn)  # warm
res = {"A": [], "B": [], "C": []}
for i in range(3):
    res["A"].append(run(variant_a))
    res["B"].append(run(variant_b))
    res["C"].append(run(variant_c))
for k, v in res.items():
    print(k, [round(x, 3) for x in v], "min", round(min(v), 3))
