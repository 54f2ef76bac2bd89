"""Warehouse patterns: SCD Type-2 versioning, reproducible hash
sampling, histogram binning, conditional aggregation.

The remaining everyday shapes of a lakehouse workload: building
slowly-changing dimensions from event history, drawing the *same*
deterministic sample in any engine (hash sampling — the reproducible
alternative to RNG TABLESAMPLE for training-data splits), binned
distributions, and FILTER-style conditional aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


@query(
    "q_scd2",
    oracle="""
    SELECT o_custkey AS custkey,
           o_orderstatus AS status,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS valid_to,
           CASE WHEN lead(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM orders
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: each change event
    becomes a version row with [valid_from, valid_to) derived via
    lead(); the open-ended row is flagged current. One shuffle on the
    dimension key — the standard merge-free SCD2 derivation."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w)
    return t.orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "q_sample_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample via md5 prefix on the key — unlike
    RNG TABLESAMPLE, the same rows are selected by any engine, any
    partitioning, any run (hex prefix < '1a' ≈ 26/256). This is how
    training-data train/eval splits stay stable across a pipeline
    rebuilt in different engines."""
    t = load_tables(spark, sf_dir)
    return t.orders.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).select("o_orderkey", "o_totalprice")


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (distribution profiling): integer binning
    + per-bin extrema; one map-side-combined aggregate."""
    t = load_tables(spark, sf_dir)
    bin_ = F.floor(F.col("o_totalprice") / 50000.0).alias("bin")
    return t.orders.groupBy(bin_).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_or(o_orderstatus = 'P') AS any_pending,
           bool_and(o_totalprice > 0) AS all_positive,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                         THEN CAST(o_totalprice AS DECIMAL(25,6)) END) AS DOUBLE)
             AS open_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation battery: count_if / bool_or / bool_and
    / filtered decimal sum (SQL FILTER-clause semantics)."""
    t = load_tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_f"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.sum(
            F.when(
                F.col("o_orderstatus") == "O",
                F.col("o_totalprice").cast("decimal(25,6)"),
            )
        )
        .cast("double")
        .alias("open_total"),
    )


@query(
    "q_sample_weighted",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS w,
             round(pow(
               (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS UBIGINT) + 1) / 4294967297.0,
               1.0 / length(text)), 6) AS k
      FROM documents
    )
    SELECT doc_id, w, k
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT 20
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis–Spirakis A-ES):
    each doc draws a reproducible uniform u from an md5-derived
    integer and competes with key u^(1/w), w = doc length; the
    top-n by key IS a weighted sample without replacement. The
    hash-derived uniform replaces RNG state — the same property that
    makes [[q_sample_hash]] reproducible across engines and runs —
    so quality-weighted training-data draws are stable under
    re-execution, resharding, and engine swap. One scan + TakeOrdered
    (no shuffle beyond the top-n heap merge); keys are rounded before
    ranking so libm pow ulp differences can't reorder the sample."""
    t = load_tables(spark, sf_dir)
    hex8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    u = (F.conv(hex8, 16, 10).cast("double") + 1) / F.lit(4294967297.0)
    w = F.length("text").cast("long")
    key = F.round(F.pow(u, 1.0 / F.length("text")), 6)
    return (
        t.documents.select("doc_id", w.alias("w"), key.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(20)
    )


@query(
    "q_dedup_keep_latest",
    oracle="""
    SELECT user_id, event_id AS latest_event, event_type AS latest_type,
           round(value, 6) AS latest_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key compaction: collapse an append-only
    change stream to each key's most recent record (the read-side
    compaction under every CDC/upsert table, and the batch analog of
    [[q_upsert]]'s merge). Rank-filter rewrites to WindowGroupLimit,
    so only each key's top row survives the shuffle — at 100 TB this
    runs as one key-partitioned pass, no self-join against a
    max-timestamp aggregate."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event"),
            F.col("event_type").alias("latest_type"),
            F.round("value", 6).alias("latest_value"),
        )
    )


@query(
    "q_sequence_gaps",
    oracle="""
    WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders
                  WHERE o_orderstatus = 'F'),
    stepped AS (
      SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM keys
    )
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
           CAST(nxt - k - 1 AS BIGINT) AS missing
    FROM stepped
    WHERE nxt - k > 1
    """,
)
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection (missing-id ranges in a key sequence)
    — the completeness check for ingest pipelines that must account
    for every upstream record; scoped here to the 'F' partition of
    the key space so the fixture actually contains holes. lead() over the distinct key set
    turns each adjacent pair with a hole into one (gap_start,
    gap_end, missing) row; the global window runs over the
    deduplicated key column only. At extreme key cardinality,
    range-partition the sort and stitch partition boundaries with a
    second 1-row-per-partition pass."""
    t = load_tables(spark, sf_dir)
    keys = (
        t.orders.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    stepped = keys.select("k", F.lead("k").over(Window.orderBy("k")).alias("nxt"))
    return stepped.where(F.col("nxt") - F.col("k") > 1).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("k") - 1).alias("missing"),
    )


@query(
    "q_scd2_lookup",
    oracle="""
    WITH dim AS (
      SELECT custkey, vfrom, status FROM (
        SELECT o_custkey AS custkey, o_orderdate AS vfrom,
               o_orderstatus AS status,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    ),
    facts AS (
      SELECT l_orderkey, l_linenumber, o_custkey AS custkey, l_shipdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.l_shipdate,
           d.status AS status_at_ship, d.vfrom AS status_since
    FROM facts f ASOF LEFT JOIN dim d
      ON f.custkey = d.custkey AND f.l_shipdate >= d.vfrom
    """,
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the [[q_scd2]] dimension: each
    shipped line item reads the customer's order status AS OF its
    ship date — the consumption side of a type-2 dimension (joining
    facts to the version valid at event time, never the current one).
    The dimension first collapses to one deterministic row per
    (custkey, change date) (max orderkey wins — DuckDB's ASOF is
    otherwise free to pick either tie). Executed as the union +
    running last(ignorenulls) as-of formulation over a (custkey,
    status) struct payload: one shuffle on the key, one in-partition
    sort, skew-safe because each customer's fact+dim timeline stays
    in one partition — a window's cost profile, no range join."""
    t = load_tables(spark, sf_dir)
    w_dedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    dim = (
        t.orders.withColumn("rn", F.row_number().over(w_dedup))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("vfrom"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    facts = t.lineitem.join(
        # two-column key projection: ~16B/row, broadcastable at any
        # realistic orders cardinality per executor — the fact table
        # never shuffles for the key pickup
        F.broadcast(t.orders.select("o_orderkey", "o_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("o_custkey").alias("custkey"),
        "l_shipdate",
    )
    payload_t = "struct<vfrom:timestamp_ntz,status:string>"
    lefts = facts.select(
        "custkey",
        F.col("l_shipdate").alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in facts.columns]).alias("_l"),
        F.lit(None).cast(payload_t).alias("_p"),
    )
    rights = dim.select(
        "custkey",
        F.col("vfrom").alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lefts.schema["_l"].dataType).alias("_l"),
        F.struct(F.col("vfrom"), F.col("status")).alias("_p"),
    )
    w = (
        Window.partitionBy("custkey")
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lefts.unionByName(rights).withColumn(
        "_hit", F.last("_p", ignorenulls=True).over(w)
    )
    return (
        merged.where(F.col("_is_left") == 1)
        .select(
            F.col("_l.l_orderkey").alias("l_orderkey"),
            F.col("_l.l_linenumber").alias("l_linenumber"),
            F.col("_l.custkey").alias("custkey"),
            F.col("_l.l_shipdate").alias("l_shipdate"),
            F.col("_hit.status").alias("status_at_ship"),
            F.col("_hit.vfrom").alias("status_since"),
        )
    )


@query(
    "q_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE tree AS (
      SELECT c_custkey, c_custkey AS root, 0 AS depth
      FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, t.root, t.depth + 1
      FROM customer c JOIN tree t ON c.c_custkey // 10 = t.c_custkey
      WHERE c.c_custkey >= 10
    )
    SELECT t.root, CAST(t.depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(25,2)) * 100
                         AS BIGINT)) AS DOUBLE) / 100.0 AS bal_sum
    FROM tree t JOIN customer c USING (c_custkey)
    GROUP BY 1, 2
    """,
)
def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE, hierarchy-walk shape — the second recursive
    form beside [[q_recursive_cte]]'s hop-capped BFS: this recursion
    is UNBOUNDED (terminates when the child frontier empties, not at
    a hop literal) and its output feeds an aggregation join — the
    org-chart / BOM-explosion rollup, over a deterministic
    hierarchy derived from the data: customers form a 10-ary tree
    (parent = c_custkey DIV 10, roots are keys < 10), the anchor
    seeds the roots, and each iteration joins the children of the
    previous level — O(log10 N) iterations regardless of corpus
    size, each one an equi-join Catalyst plans like any other (the
    recursion does NOT collect to the driver). The rollup reports
    per (root, depth) subtree width and account-balance cents —
    exact integers plus one final double division, so the DuckDB
    recursive oracle matches hash-exactly. At 100 TB each iteration
    is a broadcast join against the previous level's frontier
    (bounded by tree width), and the recursion depth is the
    hierarchy's, not the data's.

    Cost anatomy (declared, BASELINE.md r10): the bench row is
    per-ITERATION job latency — each of the ~5 recursion levels
    schedules its own Spark jobs (~0.2 s each in local mode) against
    a DuckDB oracle that iterates in-process — the q_time_travel /
    streaming structural-floor class, conservative direction. A/Bs
    that did NOT move it (recorded): broadcast hint on the frontier,
    shuffle partitions 2 scoped over the execution — the floor is
    scheduling, not shuffle width, and it amortizes to zero on a
    cluster where each level joins real data volumes."""
    load_tables(spark, sf_dir)  # registers the `customer` temp view
    return spark.sql(
        """
        WITH RECURSIVE tree AS (
          SELECT c_custkey, c_custkey AS root, 0 AS depth
          FROM customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, t.root, t.depth + 1
          FROM customer c JOIN tree t ON c.c_custkey DIV 10 = t.c_custkey
          WHERE c.c_custkey >= 10
        )
        SELECT t.root, CAST(t.depth AS BIGINT) AS depth,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(25,2)) * 100
                             AS BIGINT)) AS DOUBLE) / 100.0 AS bal_sum
        FROM tree t JOIN customer c USING (c_custkey)
        GROUP BY 1, 2
        """
    )
