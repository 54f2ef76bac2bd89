"""Interleaved A/B for q_hll_distinct at sf0.1: (A) current — the
Karp-Rabin fingerprint char-folded over each 3-word SHINGLE string;
(B) word-level composition — fp and 31^len folded once per WORD, each
shingle fp assembled from three word fps by the exact KR concat rule
fp(xy) = (fp(x)*31^len(y) + fp(y)) mod P, so the values are provably
identical and the oracle unchanged. Min-of-3, arms alternated."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

import lakehouse_app_spark as eng

SF = "/root/testdata/sf0.1"
spark = eng.get_spark(app_name="ab-hll")
spark.sparkContext.setLogLevel("ERROR")
eng.load_all_queries()

from lakehouse_app_spark.operators.sketches import (
    HLL_M,
    _HLL_A,
    _HLL_B,
    _HLL_SCALE_SPARK,
)
from lakehouse_app_spark.operators.corpus_prep import _FP_SPARK
from lakehouse_app_spark.runtime_cache import scoped_persist
from lakehouse_app_spark.sources.tables import load_tables

P = 2147483647


def finish(sh):
    """sh: (source, s, h) — registers + exact arms, shared."""
    w = F.expr(f"h div {HLL_M}")
    rho = F.when(w == 0, F.lit(24)).otherwise(F.lit(24) - F.length(F.bin(w)))
    regs = (
        sh.select("source", (F.col("h") % HLL_M).alias("idx"), rho.alias("r"))
        .groupBy("source", "idx")
        .agg(F.max("r").alias("rho"))
    )
    agg = regs.groupBy("source").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - rho)")).alias("psum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    ex = sh.groupBy("source").agg(F.count_distinct("s").alias("n_exact"))
    denom = F.col("psum") + (F.lit(HLL_M) - F.col("n_present")) * F.expr(
        "shiftleft(CAST(1 AS BIGINT), 40)"
    )
    est = F.round(F.expr(_HLL_SCALE_SPARK) / denom, 4)
    return agg.join(ex, "source").select(
        "source", "n_exact", est.alias("hll_est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_err"),
    )


def variant_a(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    sh = (
        t.documents.select("source", F.split(F.lower("text"), " ").alias("tk"))
        .where(F.size("tk") >= 3)
        .select("source", F.explode(F.expr(
            "transform(sequence(1, size(tk) - 2), "
            "i -> concat(tk[i-1], ' ', tk[i], ' ', tk[i+1]))")).alias("s"))
        .transform(scoped_persist)
    )
    fp = F.expr(_FP_SPARK.format(w="s"))
    h = (F.lit(_HLL_A) * fp + F.lit(_HLL_B)) % F.lit(P)
    return finish(sh.select("source", "s", h.alias("h")))


_SHINGLE_FP = (
    f"transform(sequence(1, size(tk) - 2), i -> named_struct("
    f"'s', concat(tk[i-1], ' ', tk[i], ' ', tk[i+1]), "
    f"'fp', ((((((fpw[i-1] * 31 + 32) % {P}) * pw[i] + fpw[i]) % {P})"
    f" * 31 + 32) % {P} * pw[i+1] + fpw[i+1]) % {P}))"
)


def variant_b(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "source", F.split(F.lower("text"), " ").alias("tk")
    ).where(F.size("tk") >= 3)
    per_word = toks.select(
        "source",
        "tk",
        F.expr(
            "transform(tk, w -> aggregate(transform(split(w, ''), "
            "c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), "
            f"(acc, c) -> (acc * 31 + c) % {P}))"
        ).alias("fpw"),
        F.expr(
            "transform(tk, w -> aggregate(split(w, ''), CAST(1 AS BIGINT), "
            f"(acc, c) -> (acc * 31) % {P}))"
        ).alias("pw"),
    )
    sh = (
        per_word.select("source", F.explode(F.expr(_SHINGLE_FP)).alias("sf"))
        .select("source", F.col("sf.s").alias("s"), F.col("sf.fp").alias("fp"))
        .transform(scoped_persist)
    )
    h = (F.lit(_HLL_A) * F.col("fp") + F.lit(_HLL_B)) % F.lit(P)
    return finish(sh.select("source", "s", h.alias("h")))


def run(fn):
    t0 = time.perf_counter()
    fn(spark, SF).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    eng.release_caches()
    return dt


ref = sorted(map(tuple, variant_a(spark, SF).collect())); eng.release_caches()
got = sorted(map(tuple, variant_b(spark, SF).collect())); eng.release_caches()
print("identical:", got == ref)
run(variant_a); run(variant_b)
res = {"A": [], "B": []}
for i in range(3):
    res["A"].append(run(variant_a))
    res["B"].append(run(variant_b))
for k, v in res.items():
    print(k, [round(x, 3) for x in v], "min", round(min(v), 3))
