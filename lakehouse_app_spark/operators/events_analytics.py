"""Event-stream analytics: funnels, cohort retention, time-range
rolling windows, anomaly detection, and touch attribution.

The reference app's only event surface is its chat session log
(`app/app.py:85-92` — ordered per-session message history). These
operators generalize that "ordered events per key" shape into the
standard product-analytics battery every warehouse runs over an
events table. All are single-shuffle hash aggregations or
per-key window scans — at 100 TB the events table is
date-partitioned and each query prunes to its scan window, then
shuffles once on `user_id` (or `event_type`), which AQE sizes at
runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


@query(
    "q_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ), counts AS (
      SELECT
        count(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS c1,
        count(CASE WHEN t_view     > t_signup THEN 1 END) AS c2,
        count(CASE WHEN t_click    > t_view AND t_view > t_signup
                   THEN 1 END) AS c3,
        count(CASE WHEN t_purchase > t_click AND t_click > t_view
                    AND t_view > t_signup THEN 1 END) AS c4
      FROM per_user
    )
    SELECT stage, users FROM (
      SELECT 1 AS ord, 'signup' AS stage, c1 AS users FROM counts
      UNION ALL SELECT 2, 'view_after_signup', c2 FROM counts
      UNION ALL SELECT 3, 'click_after_view', c3 FROM counts
      UNION ALL SELECT 4, 'purchase_after_click', c4 FROM counts
    ) ORDER BY ord
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: signup → view → click → purchase.

    One hash aggregation on ``user_id`` computes each user's first
    timestamp per stage (map-side partial aggregation does most of
    the work), then a single-row reduction counts users whose stage
    timestamps are strictly increasing. NULL-safe: a comparison with
    a missing stage is NULL → user not counted. At scale this is one
    shuffle of |users| rows regardless of event volume.
    """
    t = load_tables(spark, sf_dir)

    def first_ts(ev: str):
        return F.min(F.when(F.col("event_type") == ev, F.col("ts"))).alias(f"t_{ev}")

    per_user = t.events.groupBy("user_id").agg(
        first_ts("signup"), first_ts("view"), first_ts("click"), first_ts("purchase")
    )
    counts = per_user.agg(
        F.count(F.when(F.col("t_signup").isNotNull(), 1)).alias("c1"),
        F.count(F.when(F.col("t_view") > F.col("t_signup"), 1)).alias("c2"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_view") > F.col("t_signup")),
                1,
            )
        ).alias("c3"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_view") > F.col("t_signup")),
                1,
            )
        ).alias("c4"),
    )
    return counts.select(
        F.expr(
            "stack(4, 'signup', c1, 'view_after_signup', c2, "
            "'click_after_view', c3, 'purchase_after_click', c4) "
            "AS (stage, users)"
        )
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
      FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.activity_week) // 7
                AS INT) AS week_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle.

    Cohort = ISO week of a user's first event; each (cohort, offset)
    cell counts distinct users active that many weeks later. Both
    engines truncate weeks to Monday. Two aggregations shuffle on
    ``user_id`` (users ≪ events, partial agg collapses early); the
    final cell aggregation is over |users × weeks| rows. Week math is
    integral (both weeks are Monday-aligned → day delta is an exact
    multiple of 7).
    """
    t = load_tables(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = t.events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("activity_week", "cohort_week") / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "q_window_timerange",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ), 4) AS rolling_1h
    FROM events
    """,
)
def q_window_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour sum — a RANGE (time-interval) frame,
    not a ROWS frame: every event sums all of that user's events in
    the trailing hour, however many there are.

    Ordering key is epoch **microseconds** on both engines so the
    frame boundary is exact (no second-truncation divergence). One
    window scan per user partition; at scale this is a single
    shuffle on ``user_id`` and a sort within partitions — no
    self-join blowup, unlike the naive `e1 JOIN e2 ON ts BETWEEN`
    formulation.
    """
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("rolling_1h"),
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH scored AS (
      SELECT event_id, event_type, value,
             (value - avg(value) OVER (PARTITION BY event_type))
               / stddev_samp(value) OVER (PARTITION BY event_type) AS z
      FROM events
    )
    SELECT event_id, event_type, round(value, 4) AS value,
           round(z, 4) AS zscore
    FROM scored WHERE abs(z) > 2
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event_type (|z| > 2).

    Whole-partition window avg/stddev → standardize → filter. Both
    engines compute the same sample stddev over the same partitions;
    z is rounded only at output. At 100 TB the per-type moments
    would come from a 5-row broadcast aggregate instead of a window
    scan, but the window form keeps it one shuffle here and Catalyst
    collapses both window functions into one exchange.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type")
    # nullif-guard the denominator: a zero-variance partition would
    # make z = 0/0 = NaN in Spark (and NaN compares TRUE under
    # abs(z) > 2) while DuckDB's division yields NULL and drops the
    # row — NULL here matches the oracle on any data (review r6)
    sd = F.stddev_samp("value").over(w)
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(sd, F.lit(0.0))
    return (
        t.events.select(
            "event_id", "event_type", "value", z.alias("z")
        )
        .where(F.abs(F.col("z")) > 2)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round("z", 4).alias("zscore"),
        )
    )


@query(
    "q_attribution",
    oracle="""
    SELECT user_id,
           arg_min(event_type, event_id) AS first_touch,
           arg_max(event_type, event_id) AS last_touch,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS purchases,
           round(sum(CASE WHEN event_type = 'purchase' THEN value
                          ELSE 0 END), 4) AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch attribution per user.

    ``min_by``/``max_by`` on the unique ``event_id`` (events are
    generated in ts order, so event_id is the deterministic event
    sequence) pick each user's first and last event type in the same
    aggregation that counts and sums purchases — one shuffle, fully
    map-side combinable, no window pass needed. The reference keeps
    per-session ordered history (`app/app.py:85-92`); this is the
    aggregate view of that ordering.
    """
    t = load_tables(spark, sf_dir)
    return t.events.groupBy("user_id").agg(
        F.expr("min_by(event_type, event_id)").alias("first_touch"),
        F.expr("max_by(event_type, event_id)").alias("last_touch"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0))),
            4,
        ).alias("purchase_value"),
    )


# ------------------------------------------ robust MAD anomaly gate

MAD_K = 0.6745    # Phi^-1(0.75): scales MAD to sigma-equivalents
MAD_CUT = 3.5     # Iglewicz & Hoaglin recommended modified-z cutoff


@query(
    "q_anomaly_mad",
    oracle=f"""
    WITH hc AS (
      SELECT *, CAST(round(value * 100) AS BIGINT) * 2 AS x
      FROM events
    ),
    med AS (
      SELECT *, median(x) OVER (PARTITION BY event_type) AS m2
      FROM hc
    ),
    mad AS (
      SELECT *,
             median(2 * abs(x - m2)) OVER (PARTITION BY event_type) AS mad4
      FROM med
    )
    SELECT event_id, event_type, round(value, 4) AS value,
           round(m2 / 200.0, 4) AS median_val,
           round({MAD_K!r} * (2 * (x - m2)) / nullif(mad4, 0.0), 4)
             AS robust_z
    FROM mad
    WHERE abs({MAD_K!r} * (2 * (x - m2)) / nullif(mad4, 0.0)) > {MAD_CUT!r}
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via the modified z-score — the MAD
    gate that survives what breaks [[q_anomaly_zscore]]: mean and
    stddev are themselves dragged by the outliers they're meant to
    flag (a single 10^6 reading inflates sigma until nothing else
    trips), while median and MAD have a 50% breakdown point. The
    modified z is {MAD_K} * (x - median) / MAD (the constant maps
    MAD to sigma-equivalents under normality) with the Iglewicz &
    Hoaglin 1993 cutoff |z| > {MAD_CUT}.

    Two same-key window aggregates (median, then median of absolute
    deviations — the second depends on the first, so they are
    inherently sequential) share ONE exchange on event_type. The
    medians run over EXACT INTEGER units (r9, after a 1-ulp
    float-median divergence at sf0.1 flipped one row's 4-dp rounding
    across engines): values are 2-dp money, so x = 2·cents is
    integral, median(x) averages two ints → integral, 2·|x − m2| is
    integral, and MAD4 = median of those is integral again — every
    input to the final K·2·(x−m2)/MAD4 double expression is exact,
    the expression shapes are identical in both engines, and the
    result is bit-identical, not merely close. At 100 TB the
    per-type medians would come from a |types|-row broadcast
    aggregate (two passes) instead of full-partition windows; the
    window form keeps it one shuffle at bench scale and states the
    swap here."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type")
    hc = t.events.withColumn(
        "x", F.round(F.col("value") * 100, 0).cast("long") * 2
    )
    med = hc.withColumn("m2", F.median("x").over(w))
    mad = med.withColumn(
        "mad4",
        F.median(F.lit(2) * F.abs(F.col("x") - F.col("m2"))).over(w),
    )
    rz = (
        F.lit(MAD_K)
        * (F.lit(2) * (F.col("x") - F.col("m2")))
        / F.nullif(F.col("mad4"), F.lit(0.0))
    )
    return (
        mad.where(F.abs(rz) > MAD_CUT)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(F.col("m2") / 200.0, 4).alias("median_val"),
            F.round(rz, 4).alias("robust_z"),
        )
    )
