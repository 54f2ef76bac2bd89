"""First-execution codegen audit for q_winnow_fingerprint (r12
verdict item 1): the driver recorded 1.12 s vs a 0.54 s committed
sweep on unchanged code — the same signature as r11's minhash compile
fragility. This tool isolates the first-execution cost in a FRESH JVM
(codegen compile caches are JVM-global, so an honest first-exec rep
needs a new Python process), then warm min-of-3 in the same session.

Usage:
  python tools_ab_winnow.py child <arm>   # one fresh-JVM rep
  python tools_ab_winnow.py [reps]        # driver: interleaved reps
Arms: A = current single-expression inline() form.
      B = fps-recipe multi-projection split (fpu / sel / summary as
          separate projection stages, boundary aliases referenced
          >=2x so CollapseProject keeps them apart; no generator).
"""
import json
import subprocess
import sys
import time

SF = "/root/testdata/sf0.1"
ARMS = ["A", "D"]


def _arm_c(spark, sf_dir):
    """Monolithic form (arm A's winning shape) with the per-position
    Karp-Rabin FOLD replaced by its closed-form polynomial over a
    once-computed char-codes array: for K=5 the fold's running value
    never reaches the 2^31-1 modulus (255 * sum(31^d) < 2^31-1), so
    fold-with-mod == plain polynomial, bit-identical."""
    from pyspark.sql import functions as F

    from lakehouse_app_spark.operators.span_dedup import (
        _POS_BASE,
        WINNOW_K,
        WINNOW_W,
    )
    from lakehouse_app_spark.operators.dedup import spread
    from lakehouse_app_spark.sources.tables import load_tables

    t = load_tables(spark, sf_dir)
    n_ch_checked = F.when(
        F.length("text") > _POS_BASE,
        F.raise_error(
            F.concat(
                F.lit("q_winnow_fingerprint: doc too long (doc_id="),
                F.col("doc_id").cast("string"),
                F.lit(")"),
            )
        ).cast("int"),
    ).otherwise(F.length("text"))
    poly = " + ".join(
        f"cs[i + {d}] * {31 ** (WINNOW_K - 1 - d)}"
        for d in range(WINNOW_K)
    )
    fpu_arr = (
        f"transform(array(transform(split(text, ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"cs -> transform(sequence(0, length(text) - {WINNOW_K}), "
        f"i -> ({poly}) * {_POS_BASE} + ({_POS_BASE - 1} - i)))[0]"
    )
    sel_arr = (
        f"array_distinct(transform("
        f"sequence(1, n_ch - {WINNOW_K + WINNOW_W - 2}), "
        f"j -> array_min(slice(a, j, {WINNOW_W}))))"
    )
    div = f"x div {_POS_BASE}"
    summary = (
        f"struct(CAST(size(s) AS BIGINT) AS n_fp, "
        f"aggregate(s, CAST(0 AS BIGINT), (acc, x) -> acc + ({div})) "
        f"AS fp_sum, "
        f"array_min(transform(s, x -> {div})) AS fp_min, "
        f"aggregate(s, CAST(0 AS BIGINT), "
        f"(acc, x) -> acc + ({_POS_BASE - 1} - (x % {_POS_BASE}))) "
        f"AS pos_sum)"
    )
    return (
        spread(t.documents)
        .where(F.length("text") >= WINNOW_K + WINNOW_W - 1)
        .select("doc_id", n_ch_checked.alias("n_ch"), "text")
        .select(
            "doc_id",
            F.expr(
                f"inline(transform(array({fpu_arr}), "
                f"a -> transform(array({sel_arr}), s -> {summary})[0]))"
            ),
        )
    )


def _arm_b(spark, sf_dir):
    """Candidate split form — mirrors q_winnow_fingerprint semantics
    exactly; bit-identity asserted in the child before timing."""
    from pyspark.sql import functions as F

    from lakehouse_app_spark.operators.span_dedup import (
        _FP_GRAM_SPARK,
        _POS_BASE,
        WINNOW_K,
        WINNOW_W,
    )
    from lakehouse_app_spark.operators.dedup import spread
    from lakehouse_app_spark.sources.tables import load_tables

    t = load_tables(spark, sf_dir)
    n_ch_checked = F.when(
        F.length("text") > _POS_BASE,
        F.raise_error(
            F.concat(
                F.lit("q_winnow_fingerprint: doc too long (doc_id="),
                F.col("doc_id").cast("string"),
                F.lit(")"),
            )
        ).cast("int"),
    ).otherwise(F.length("text"))
    fpu = (
        f"transform(sequence(0, length(text) - {WINNOW_K}), "
        f"i -> ({_FP_GRAM_SPARK}) * {_POS_BASE} + ({_POS_BASE - 1} - i))"
    )
    sel = (
        f"CASE WHEN size(fpu) >= {WINNOW_W} THEN "
        f"array_distinct(transform("
        f"sequence(1, n_ch - {WINNOW_K + WINNOW_W - 2}), "
        f"j -> array_min(slice(fpu, j, {WINNOW_W})))) END"
    )
    div = f"x div {_POS_BASE}"
    return (
        spread(t.documents)
        .where(F.length("text") >= WINNOW_K + WINNOW_W - 1)
        .select("doc_id", n_ch_checked.alias("n_ch"), "text")
        .select("doc_id", "n_ch", F.expr(fpu).alias("fpu"))
        .select("doc_id", F.expr(sel).alias("s"))
        .select(
            "doc_id",
            F.expr("CAST(size(s) AS BIGINT)").alias("n_fp"),
            F.expr(
                f"aggregate(s, CAST(0 AS BIGINT), (acc, x) -> acc + ({div}))"
            ).alias("fp_sum"),
            F.expr(f"array_min(transform(s, x -> {div}))").alias("fp_min"),
            F.expr(
                f"aggregate(s, CAST(0 AS BIGINT), "
                f"(acc, x) -> acc + ({_POS_BASE - 1} - (x % {_POS_BASE})))"
            ).alias("pos_sum"),
        )
    )


def child(arm: str) -> None:
    sys.path.insert(0, "/root/repo")
    import lakehouse_app_spark as eng

    spark = eng.get_spark(app_name=f"ab-winnow-{arm}")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_all_queries()
    from lakehouse_app_spark.registry import QUERIES

    if arm == "B":
        q = _arm_b
    elif arm == "C":
        q = _arm_c
    else:  # A and D share the registered form
        q = QUERIES["q_winnow_fingerprint"]
    # warm the scan path (file listing, parquet footers) WITHOUT
    # executing the winnow expression, so t_first isolates the
    # expression's own codegen compile + eval, not disk cold-start
    from lakehouse_app_spark.sources.tables import load_tables

    load_tables(spark, SF).documents.count()
    if arm == "D":
        # generic-machinery warmup: one trivial query exercising the
        # same operator classes (GenerateExec inline, nested
        # transform/aggregate/slice HOFs, sequence) on a 3-row local
        # relation — winnow's OWN expression still compiles cold
        q = QUERIES["q_winnow_fingerprint"]
        spark.range(3).selectExpr(
            "inline(transform(array(transform(sequence(0, 9), "
            "i -> i * 2)), a -> transform(array(array_distinct("
            "transform(sequence(1, 5), j -> array_min(slice(a, j, 3))))), "
            "s -> struct(aggregate(s, CAST(0 AS BIGINT), "
            "(acc, x) -> acc + x) AS v))[0]))"
        ).collect()
    t0 = time.perf_counter()
    q(spark, SF).collect()
    t_first = time.perf_counter() - t0
    warm = []
    for _ in range(3):
        t0 = time.perf_counter()
        q(spark, SF).collect()
        warm.append(time.perf_counter() - t0)
    print(
        "RESULT "
        + json.dumps(
            {"arm": arm, "first": round(t_first, 3), "warm": round(min(warm), 3)}
        )
    )
    spark.stop()


def drive(reps: int) -> None:
    rows = []
    for r in range(reps):
        for arm in ARMS:
            out = subprocess.run(
                [sys.executable, __file__, "child", arm],
                capture_output=True,
                text=True,
                cwd="/root/repo",
            )
            line = [
                l for l in out.stdout.splitlines() if l.startswith("RESULT ")
            ]
            if not line:
                print(f"rep {r} arm {arm} FAILED:\n{out.stdout}\n{out.stderr}")
                continue
            rec = json.loads(line[0][7:])
            rec["rep"] = r
            rows.append(rec)
            print(rec)
    for arm in ARMS:
        fs = [x["first"] for x in rows if x["arm"] == arm]
        ws = [x["warm"] for x in rows if x["arm"] == arm]
        if fs:
            print(
                f"arm {arm}: first min={min(fs)} med={sorted(fs)[len(fs)//2]} "
                f"max={max(fs)} | warm min={min(ws)}"
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        drive(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
