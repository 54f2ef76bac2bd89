"""Time-series warehouse patterns over the events table: multi-
resolution rollups (the "hypertable continuous aggregate" shape) and
dense date-spine gap filling.

The reference's only time axis is `create_time` passed through REST
payloads (`lakehouse_app_helpers.py:35`); these operators supply the
time-series tier a production events pipeline needs. Both are
single-scan shapes: the rollup reaggregates coarse tiers from fine
tiers (never re-reading the fact table), the spine join builds the
calendar from one aggregate row and explodes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_app_spark.functions.compat import DEC
from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


@query(
    "q_rollup_hypertable",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_h,
             count(*) AS n,
             SUM(CAST(value AS DECIMAL(25,6))) AS v
      FROM events GROUP BY 1
    )
    SELECT strftime(date_trunc('day', bucket_h), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value,
           round(CAST(SUM(v) AS DOUBLE) / SUM(n), 6) AS avg_value
    FROM hourly GROUP BY 1
    """,
)
def q_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier continuous-aggregate rollup: events → hourly buckets
    → daily buckets computed FROM the hourly tier, never re-scanning
    the raw facts — the TimescaleDB hypertable / Druid rollup
    pattern. At 100 TB the hourly tier is a materialized incremental
    table and the daily tier reads it (1/3600th the rows). Hourly
    partial sums use exact decimal so re-aggregation order cannot
    diverge between engines; the avg divides the same two exact
    operands on both sides.
    """
    t = load_tables(spark, sf_dir)
    hourly = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("v"),
    )
    return hourly.groupBy(
        F.date_format(F.date_trunc("day", F.col("bucket_h")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
        F.round(F.sum("v").cast("double") / F.sum("n"), 6).alias("avg_value"),
    )


@query(
    "q_date_spine",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n,
             CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS BIGINT) AS purchases
      FROM events GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
           coalesce(d.purchases, 0) AS purchases
    FROM spine s LEFT JOIN daily d USING (day)
    """,
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar spine with gap filling: every day between the
    first and last event appears, zero-filled where no events landed
    — the shape every reporting dashboard needs before charting.

    The spine is built from a single min/max aggregate row via
    ``sequence`` + ``explode`` (pure JVM generator, no driver loop),
    then broadcast-joined to the daily aggregate: at any scale the
    spine is |days| rows, so the join never shuffles the fact side
    twice.
    """
    t = load_tables(spark, sf_dir)
    spine = (
        t.events.agg(
            F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
        )
        .select(
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
        )
    )
    daily = t.events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("purchases", F.lit(0)).alias("purchases"),
        )
    )


@query(
    "q_concurrency",
    oracle="""
    WITH points AS (
      SELECT ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT ts + INTERVAL 30 MINUTE, -1 FROM events
    ), run AS (
      SELECT t, CAST(SUM(delta) OVER (ORDER BY t, delta
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      FROM points
    )
    SELECT strftime(date_trunc('day', t), '%Y-%m-%d') AS day,
           max(c) AS peak_concurrency
    FROM run GROUP BY 1
    """,
)
def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency sweep line: each event opens a 30-minute
    activity interval; +1/-1 boundary points, sorted, prefix-summed —
    the classic "max simultaneous sessions" metric (capacity
    planning, rate limiting). Ties sort close-before-open (delta
    ascending), the half-open-interval convention. Locally this is
    one global ordered window; at 100 TB the same prefix sum runs as
    range-partition partials + broadcast cumulative offsets (two
    passes, no single-node sort) — the day-level max then aggregates
    per partition. Day-max is invariant to the arbitrary ordering
    among identical boundary points."""
    t = load_tables(spark, sf_dir)
    points = t.events.select(F.col("ts").alias("t"), F.lit(1).alias("delta")).unionAll(
        t.events.select(
            F.expr("ts + INTERVAL 30 MINUTES").alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    run = points.select(
        "t", F.sum("delta").over(w).cast("bigint").alias("c")
    )
    return run.groupBy(
        F.date_format(F.date_trunc("day", F.col("t")), "yyyy-MM-dd").alias("day")
    ).agg(F.max("c").alias("peak_concurrency"))


@query(
    "q_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT day, n,
           round(quantile_cont(n, 0.5) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
             AS med7
    FROM daily
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of daily event volume — the
    robust-smoothing alternative to a rolling mean (outlier days
    don't drag the trend). An exact order-statistic inside a moving
    window frame: both engines interpolate type-7 quantiles over the
    same ≤7-row frame, so values match to 6 dp. The window runs over
    the already-aggregated |days|-sized table, never the raw events
    — a global ordered frame on a tiny input is safe at any corpus
    scale."""
    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "n",
        F.round(F.expr("percentile(n, 0.5)").over(w), 6).alias("med7"),
    )


@query(
    "q_ewma",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (ORDER BY date_trunc('day', ts)) AS i
      FROM events GROUP BY date_trunc('day', ts)
    )
    SELECT day, n,
           round(0.3 * pow(0.7, i) *
                 SUM(n * pow(0.7, -i)) OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS ewma
    FROM daily
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume
    (α = 0.3) — the classic smoothing signal, made window-computable
    by the geometric factorization ewma_t = α·(1-α)^t · Σ_{i≤t}
    n_i·(1-α)^{-i}: the position-dependent weight splits into a
    per-row term inside a plain running SUM and a per-row scale
    outside it, so no recursion and no O(n²) re-scan. Runs over the
    |days|-sized daily rollup, never raw events; both engines
    evaluate the identical closed form, rounded to 4 dp (the
    (1-α)^{-i} factors grow ~10^4 over 30 days — far inside double
    range, and the rounding margin swallows libm pow ulps).

    DOMAIN BOUND (review r6): the factorization's (1-α)^{-i} term
    overflows double past i ≈ 1990 distinct days (~5.5 years at
    α=0.3), after which the whole series would silently turn NaN.
    Out-of-domain rows therefore RAISE at evaluation instead of
    shipping garbage; a longer history wants a block-rebased cascade
    of this same factorization (chunk the index, carry one scaled
    partial per chunk), which no fixture here needs."""
    t = load_tables(spark, sf_dir)
    alpha = 0.3
    daily = t.events.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    daily = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        F.row_number().over(Window.orderBy("d")).alias("i"),
    )
    guard_i = F.when(
        F.col("i") <= 1500, F.col("i")
    ).otherwise(
        F.raise_error(
            F.lit(
                "q_ewma: series exceeds the factorization's double-range "
                "domain (~1500 daily steps); use a block-rebased cascade"
            )
        )
    )
    run = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    ewma = (
        F.lit(alpha)
        * F.pow(F.lit(1 - alpha), F.col("i"))
        * F.sum(F.col("n") * F.pow(F.lit(1 - alpha), -guard_i)).over(run)
    )
    return daily.select("day", "n", F.round(ewma, 4).alias("ewma"))


@query(
    "q_fill_interp",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
      FROM events WHERE event_type = 'purchase' AND user_id % 97 = 7
      GROUP BY 1
    ), j AS (
      SELECT s.day, d.v FROM spine s LEFT JOIN daily d USING (day)
    ), w AS (
      SELECT day, v,
             last_value(v IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pd,
             first_value(v IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nd
      FROM j
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           (v IS NOT NULL) AS observed,
           round(CASE WHEN v IS NOT NULL THEN v
                 WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   pv + (nv - pv) * (date_diff('day', pd, day) * 1.0
                                     / date_diff('day', pd, nd))
                 ELSE NULL END, 6) AS v_interp
    FROM w
    """,
)
def q_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over calendar gaps in a sparse daily
    series (one thin user-bucket's purchase revenue): unobserved days
    between two observations get the straight-line value, leading/
    trailing gaps stay NULL — the gap-fill semantics of TimescaleDB's
    ``interpolate()``. Built from [[q_date_spine]]'s spine plus two
    IGNORE NULLS window walks (previous / next observation and their
    dates); the windows run over the |days|-sized rollup, never raw
    events, so the unpartitioned sort is calendar-bounded at any data
    scale. The daily sum is decimal-exact and both engines evaluate
    the identical interpolation expression on identical doubles."""
    t = load_tables(spark, sf_dir)
    spine = (
        t.events.agg(
            F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
        )
        .select(
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
        )
    )
    daily = (
        t.events.where(
            (F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 7)
        )
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("v"))
    )
    j = spine.join(F.broadcast(daily), "day", "left")
    prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    nxt = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    w = j.select(
        "day",
        "v",
        F.last("v", ignorenulls=True).over(prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(prev).alias("pd"),
        F.first("v", ignorenulls=True).over(nxt).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(nxt).alias("nd"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                F.datediff("day", "pd") * F.lit(1.0)
                / F.datediff("nd", "pd")
            ),
        )
    )
    return w.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("v").isNotNull().alias("observed"),
        F.round(interp, 6).alias("v_interp"),
    )
