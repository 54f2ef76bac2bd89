"""Approximate nearest neighbor: IVF-style partition-pruned search.

The 100 TB scale path for the reference's ANN retrieval
(`app/vector_search.py:24-33` delegates to a server-side index; here
the index is a *layout*): vectors carry a cluster-id column
(assignment to fixed centroids), the corpus is partitioned by it, and
a query probes only the nearest few clusters — partition pruning does
the rest. Brute-force exact top-k (operators/vectors.py) is the
recall baseline; this trades recall for a ~n_clusters/n_probe scan
reduction.

Determinism: the codebook is LEARNED by deterministic fixed-point
Lloyd's (operators/ann_index.py) seeded on the first-k vectors;
assignment and probe order use rounded similarity + id tie-breaks, so
the DuckDB oracle replicates the *same trained index* exactly
(SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_app_spark.operators.ann_index import (
    ivf_index,
    lloyd_means,
    lloyd_sql,
    with_cid,
)
from lakehouse_app_spark.operators.dedup import spread
from lakehouse_app_spark.operators.vectors import as_double_array, cosine_sim
from lakehouse_app_spark.registry import query
from lakehouse_app_spark.runtime_cache import scoped_persist
from lakehouse_app_spark.sources.layout import derived_table
from lakehouse_app_spark.sources.tables import load_tables

N_CENTROIDS = 8
KM_ITERS = 2
N_PROBE = 2
TOP_K = 5


_IVF_CHAIN, _IVF_CENTS, _IVF_ASG = lloyd_sql(N_CENTROIDS, KM_ITERS)


BRP_TABLES = 4          # hash tables (MLlib numHashTables analog)
BRP_BUCKET_LEN = 0.5    # bucket width over the unit-sphere projection


@query(
    "q_ann_brp_lsh",
    oracle=f"""
    WITH d AS (
      SELECT vec_id AS j, CAST(embedding AS DOUBLE[]) AS dv
      FROM embeddings WHERE vec_id < {BRP_TABLES}
    ),
    b AS (
      SELECT e.vec_id, d.j,
             CAST(floor(round(list_cosine_similarity(
                    CAST(e.embedding AS DOUBLE[]), d.dv), 6)
                  / {BRP_BUCKET_LEN}) AS BIGINT) AS v
      FROM embeddings e, d
    ),
    kb AS (SELECT j, v FROM b WHERE vec_id = 0),
    cand AS (
      SELECT DISTINCT b.vec_id
      FROM b JOIN kb ON b.j = kb.j AND b.v = kb.v
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id = 0)
    SELECT c.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        q.qv), 6) AS sim
    FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id, q
    ORDER BY sim DESC, c.vec_id
    LIMIT 5
    """,
)
def q_ann_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed random-projection LSH ANN — the same family MLlib's
    BucketedRandomProjectionLSH implements (scalar projections
    quantized into buckets of width {BRP_BUCKET_LEN}, one equi-join
    per hash table, exact rerank of the candidate union), hand-rolled
    with DETERMINISTIC seeded directions so the whole query is
    exact-oracle (r15, verdict item 8 — the MLlib variant's hash
    tables are library-private, which kept this key rows-only for 8
    rounds). Directions are the first {BRP_TABLES} corpus vectors
    (the established convention: the corpus is zero-centered, so they
    are usable random directions BOTH engines can rebuild).

    Geometry: on L2-normalized vectors the projection dot IS the
    cosine, so bucket_j(v) = floor(round(cos(v, d_j), 6) /
    {BRP_BUCKET_LEN}) — and nearest-by-Euclidean on the unit sphere
    is nearest-by-cosine, so the exact rerank ranks by cosine
    directly (euclid² = 2 − 2·cos). Candidates = vectors sharing ANY
    table's bucket with the query (MLlib's single-probe OR
    semantics); only candidates pay the exact similarity. The
    bucketed variant of the IVF scale path: random-projection buckets
    replace cluster assignment when no write-side layout exists."""
    t = load_tables(spark, sf_dir)
    dirs = t.embeddings.where(F.col("vec_id") < BRP_TABLES).select(
        F.col("vec_id").cast("int").alias("j"),
        as_double_array("embedding").alias("dv"),
    )
    packed = dirs.agg(
        F.array_sort(F.collect_list(F.struct("j", "dv"))).alias("ds")
    )
    bucket_arr = F.transform(
        F.col("ds"),
        lambda s: F.floor(
            F.round(cosine_sim(F.col("emb"), s["dv"]), 6)
            / F.lit(BRP_BUCKET_LEN)
        ),
    )
    buckets = (
        t.embeddings.select(
            "vec_id", as_double_array("embedding").alias("emb")
        )
        .join(F.broadcast(packed))
        .select("vec_id", F.posexplode(bucket_arr).alias("j", "v"))
    )
    kb = buckets.where(F.col("vec_id") == 0).select("j", "v")
    cand = (
        buckets.join(F.broadcast(kb), ["j", "v"])
        .select("vec_id")
        .distinct()
    )
    qv = _query_vec(t)
    return (
        cand.join(
            t.embeddings.select(
                "vec_id", as_double_array("embedding").alias("emb")
            ),
            "vec_id",
        )
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("emb"), F.col("qv")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(TOP_K)
    )


def _query_vec(t) -> DataFrame:
    """The benchmark query vector (vec_id 0) as a 1-row broadcastable
    frame — shared by every IVF query so the query-side projection
    cannot drift between them."""
    return t.embeddings.where(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("qv")
    )


def _probe_ids(cents: DataFrame, qv: DataFrame) -> list[int]:
    """Rank the centroids against the query vector and collect the
    top-N_PROBE cluster ids — coordinator-side index METADATA (a
    centroid-sized job, 2-row result) that both IVF queries inline
    as a literal partition filter. One copy, one tie-break."""
    return [
        r["cid"]
        for r in (
            cents.join(F.broadcast(qv))
            .select(
                "cid",
                F.round(cosine_sim(F.col("cvec"), F.col("qv")), 6).alias("psim"),
            )
            .orderBy(F.col("psim").desc(), F.col("cid"))
            .limit(N_PROBE)
            .collect()
        )
    ]


@query(
    "q_ann_ivf",
    oracle=f"""
    WITH {_IVF_CHAIN},
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    probed AS (
      SELECT c.cid
      FROM {_IVF_CENTS} c, q
      ORDER BY round(list_cosine_similarity(c.cvec, q.qv), 6) DESC, c.cid
      LIMIT {N_PROBE}
    )
    SELECT a.vec_id,
           round(list_cosine_similarity(a.emb, q.qv), 6) AS sim
    FROM {_IVF_ASG} a JOIN probed p ON a.cid = p.cid, q
    ORDER BY sim DESC, a.vec_id
    LIMIT {TOP_K}
    """,
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe against the STORED index: the Lloyd-learned
    assignment table (built once, partitioned by ``cid`` —
    operators/ann_index.py) is scanned with a literal partition
    filter for the top-{N_PROBE} probed clusters, so the scan reads
    n_probe/{N_CENTROIDS} of the corpus (``PartitionFilters`` —
    pinned by tests/test_plan_shapes.py). The probe list itself is
    index METADATA: ranking {N_CENTROIDS} centroids against the query
    vector is a centroid-sized job whose 2-row result the planner
    inlines — the same coordinator-side step the reference's
    server-side index performs before touching shards
    (`app/vector_search.py:29-33`)."""
    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    t = load_tables(spark, sf_dir)
    qv = _query_vec(t)
    probes = _probe_ids(cents, qv)
    return (
        assigned.where(F.col("cid").isin(probes))
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("emb"), F.col("qv")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


@query(
    "q_knn_classify",
    oracle=f"""
    WITH {_IVF_CHAIN},
    q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
             label AS true_label
      FROM embeddings WHERE vec_id % 5 = 0
    ),
    probed AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(c.cvec, q.qv), 6) DESC,
                          c.cid) AS rn
        FROM q, {_IVF_CENTS} c
      ) WHERE rn <= {N_PROBE}
    ),
    top AS (
      SELECT qid, vec_id FROM (
        SELECT p.qid, a.vec_id,
               row_number() OVER (PARTITION BY p.qid
                 ORDER BY round(list_cosine_similarity(a.emb, q.qv), 6) DESC,
                          a.vec_id) AS rn
        FROM {_IVF_ASG} a JOIN probed p ON a.cid = p.cid
        JOIN q ON q.qid = p.qid
        WHERE a.vec_id % 5 <> 0
      ) WHERE rn <= {TOP_K}
    ),
    votes AS (
      SELECT t.qid, e.label, CAST(count(*) AS BIGINT) AS votes
      FROM top t JOIN embeddings e ON e.vec_id = t.vec_id
      GROUP BY 1, 2
    )
    SELECT v.qid, v.pred_label, v.votes, q.true_label,
           v.pred_label = q.true_label AS correct
    FROM (SELECT qid, label AS pred_label, votes,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY votes DESC, label) AS r
          FROM votes) v
    JOIN q ON q.qid = v.qid
    WHERE v.r = 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN weak labeling THROUGH THE STORED IVF LAYOUT — the
    classifier-bootstrapping stage (pseudo-labeling, FastText-filter
    seeding, dataset-shift audits) run the way a deployment actually
    runs it once the index exists (round-9 verdict item 2; the
    brute-force ancestor's own docstring named this swap): each eval
    vector (every 5th id) probes its top-{N_PROBE} clusters, scores
    only candidates in those clusters ({N_PROBE}/{N_CENTROIDS} of the
    corpus), takes its 5 nearest labeled neighbors via
    WindowGroupLimit, and majority-votes with deterministic ties
    (votes DESC, label). Labels join AFTER top-k selection — the
    label table touches |queries|·5 rows, not the scored pair space.
    The oracle replays the identical trained index and probe plan in
    SQL ([[q_stream_vector_search]]'s treatment), so approximation is
    replicated, not excused. Exhaustive-vs-IVF quality is already
    audited per query by [[q_ann_recall]]; at 100 TB the probed scan
    is the partition-pruned layout read, and cost per labeling batch
    is n_probe/{N_CENTROIDS} of a corpus pass."""
    from lakehouse_app_spark.runtime_cache import scoped_persist

    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    t = load_tables(spark, sf_dir)
    # persisted: the query set feeds the centroid-ranking pass, the
    # scoring join (qv) and the vote audit (true_label) — three
    # separate embeddings scans when unpersisted (guide §7.2, r14)
    qs = scoped_persist(
        t.embeddings.where(F.col("vec_id") % 5 == 0).select(
            F.col("vec_id").alias("qid"),
            as_double_array("embedding").alias("qv"),
            F.col("label").alias("true_label"),
        )
    )
    wq = Window.partitionBy("qid")
    probed = (
        qs.join(F.broadcast(cents))
        .select(
            "qid",
            "cid",
            F.round(cosine_sim(F.col("cvec"), F.col("qv")), 6).alias("psim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(wq.orderBy(F.col("psim").desc(), F.col("cid"))),
        )
        .where(F.col("rn") <= N_PROBE)
        .select("qid", "cid")
    )
    top = (
        spread(assigned.where(F.col("vec_id") % 5 != 0))
        .join(F.broadcast(probed), "cid")
        .join(F.broadcast(qs.select("qid", "qv")), "qid")
        .select(
            "qid",
            "vec_id",
            F.round(cosine_sim(F.col("emb"), F.col("qv")), 6).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                wq.orderBy(F.col("sim").desc(), F.col("vec_id"))
            ),
        )
        .where(F.col("rn") <= TOP_K)
        .select("qid", "vec_id")
    )
    votes = (
        top.join(
            F.broadcast(t.embeddings.select("vec_id", "label")), "vec_id"
        )
        .groupBy("qid", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    return (
        votes.withColumn(
            "r",
            F.row_number().over(
                wq.orderBy(F.col("votes").desc(), F.col("label"))
            ),
        )
        .where(F.col("r") == 1)
        .join(F.broadcast(qs.select("qid", "true_label")), "qid")
        .select(
            "qid",
            F.col("label").alias("pred_label"),
            "votes",
            "true_label",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


def _audit_frames(spark: SparkSession, sf_dir: str):
    """Shared scaffolding of the two IVF audits ([[q_ann_recall]],
    [[q_retrieval_ndcg]]): the sampled query set (every 100th id),
    the per-query probed clusters, a rank-top-k factory, and ONE
    persisted |corpus|x|queries| scoring pass over the total
    assignment that serves both the exhaustive and IVF arms. One
    copy keeps the tie-breaks and rounding bit-identical across both
    audits and their oracles."""
    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    t = load_tables(spark, sf_dir)
    qs = t.embeddings.where(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("qid"), as_double_array("embedding").alias("qv")
    )
    wq = Window.partitionBy("qid")
    probed = (
        qs.join(F.broadcast(cents))
        .select(
            "qid",
            "cid",
            F.round(cosine_sim(F.col("cvec"), F.col("qv")), 6).alias("psim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(wq.orderBy(F.col("psim").desc(), F.col("cid"))),
        )
        .where(F.col("rn") <= N_PROBE)
        .select("qid", "cid")
    )

    def rank(df: DataFrame, *cols: str) -> DataFrame:
        return (
            df.withColumn(
                "rn",
                F.row_number().over(
                    wq.orderBy(F.col("sim").desc(), F.col("vec_id"))
                ),
            )
            .where(F.col("rn") <= TOP_K)
            .select(*cols)
        )

    # ONE scoring pass serves both arms: the stored assignment table
    # contains every vector (assignment is total) plus its cid, so
    # score once (spread across cores — the scan arrives
    # single-partition), persist the slim (qid, vec_id, cid, sim)
    # result, and derive the exhaustive ranking from all rows and
    # the IVF ranking from the probed-(qid, cid) subset.
    scored = (
        spread(assigned)
        .join(F.broadcast(qs))
        .select(
            "qid",
            "vec_id",
            "cid",
            F.round(cosine_sim(F.col("emb"), F.col("qv")), 6).alias("sim"),
        )
        .transform(scoped_persist)
    )
    return probed, scored, rank


@query(
    "q_ann_recall",
    oracle=f"""
    WITH {_IVF_CHAIN},
    qs AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 100 = 1
    ),
    probed AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(c.cvec, q.qv), 6) DESC,
                          c.cid) AS rn
        FROM qs q, {_IVF_CENTS} c
      ) WHERE rn <= {N_PROBE}
    ),
    ivf AS (
      SELECT qid, vec_id FROM (
        SELECT p.qid, a.vec_id,
               row_number() OVER (PARTITION BY p.qid
                 ORDER BY round(list_cosine_similarity(a.emb, q.qv), 6) DESC,
                          a.vec_id) AS rn
        FROM {_IVF_ASG} a JOIN probed p ON a.cid = p.cid
        JOIN qs q ON q.qid = p.qid
      ) WHERE rn <= {TOP_K}
    ),
    exact AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]), q.qv), 6) DESC,
                          e.vec_id) AS rn
        FROM embeddings e, qs q
      ) WHERE rn <= {TOP_K}
    )
    SELECT e.qid AS query_id,
           CAST(count(i.vec_id) AS BIGINT) AS n_hits,
           round(count(i.vec_id) / {TOP_K}.0, 6) AS recall_at_k
    FROM exact e LEFT JOIN ivf i ON i.qid = e.qid AND i.vec_id = e.vec_id
    GROUP BY e.qid
    """,
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} audit of the IVF probe against exhaustive
    search, per query vector (every 100th id) — the
    retrieval-quality gauge an ANN deployment reports next to its
    latency win. Both arms are deterministic (rounded sims, id
    tie-breaks), so even the ORACLE is exact: the same audit runs in
    SQL. Plan: centroids and the query set broadcast everywhere; the
    exhaustive arm is one corpus × |queries| scored pass with a
    per-query WindowGroupLimit; the IVF arm scores only probed
    clusters. At 100 TB you sample queries, never audit all of them
    — the shape is unchanged."""
    probed, scored, rank = _audit_frames(spark, sf_dir)
    ivf = rank(scored.join(F.broadcast(probed), ["qid", "cid"]), "qid", "vec_id")
    exact = rank(scored, "qid", "vec_id")
    hit = ivf.withColumn("hit", F.lit(1))
    return (
        exact.join(hit, ["qid", "vec_id"], "left")
        .groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / float(TOP_K), 6).alias("recall_at_k"),
        )
    )


# ------------------------------------------------ product quantization

PQ_M = 8          # subspaces over the 64-dim vectors
PQ_DSUB = 8       # dims per subspace
PQ_K = 16         # codebook entries per subspace (4-bit codes)

# Identical left-fold in both engines: squared-L2 over one subspace.
_SQDIST_DUCK = (
    "round(list_reduce(list_prepend(0.0, list_transform(range(1, {n}), "
    "i -> (vsub[i] - csub[i]) * (vsub[i] - csub[i]))), "
    "(acc, x) -> acc + x), 6)"
)


@query(
    "q_pq_quantize",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < {PQ_K}
    ),
    subc AS (
      SELECT cid, t.j,
             list_slice(cvec, t.j * {PQ_DSUB} + 1,
                        t.j * {PQ_DSUB} + {PQ_DSUB}) AS csub
      FROM cents, (SELECT unnest(range(0, {PQ_M})) AS j) t
    ),
    subv AS (
      SELECT vec_id, t.j,
             list_slice(CAST(embedding AS DOUBLE[]), t.j * {PQ_DSUB} + 1,
                        t.j * {PQ_DSUB} + {PQ_DSUB}) AS vsub
      FROM embeddings, (SELECT unnest(range(0, {PQ_M})) AS j) t
    ),
    d AS (
      SELECT vec_id, v.j, cid,
             {_SQDIST_DUCK.format(n=PQ_DSUB + 1)} AS dist
      FROM subv v JOIN subc c ON v.j = c.j
    ),
    a AS (
      SELECT vec_id, j, cid, dist,
             row_number() OVER (PARTITION BY vec_id, j
                                ORDER BY dist, cid) AS rn
      FROM d
    )
    SELECT vec_id,
           CAST(SUM(cid << (4 * j)) AS BIGINT) AS pq_code,
           CAST(SUM(CAST(dist AS DECIMAL(25,6))) AS DOUBLE) AS recon_err
    FROM a WHERE rn = 1 GROUP BY vec_id
    """,
)
def q_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — the PQ half of an IVF-PQ index: each
    64-dim vector splits into {PQ_M} subvectors, each assigned to the
    nearest of {PQ_K} per-subspace codebook entries (codebook pinned
    to the first {PQ_K} corpus vectors, argmin on 6-dp-rounded squared
    L2 with cid tie-break), packing the whole vector into one 32-bit
    code — a 64× compression that makes billion-vector search RAM-
    resident. Emits the packed code plus the decimal-exact
    reconstruction error (the quantization-quality audit). The
    codebook cross-join is broadcast ({PQ_M}×{PQ_K} rows); the only
    shuffles are the per-(vec,subspace) argmin window and the final
    per-vec rollup, both keyed by vec_id — balanced at any corpus
    size."""
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
                lambda j: F.struct(
                    j.alias("j"), sub(F.col("cvec"), j).alias("csub")
                ),
            )
        ).alias("s"),
    ).select("cid", F.col("s.j").alias("j"), F.col("s.csub").alias("csub"))
    subv = t.embeddings.select(
        "vec_id",
        F.explode(
            F.transform(
                jseq,
                lambda j: F.struct(
                    j.alias("j"),
                    sub(as_double_array("embedding"), j).alias("vsub"),
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
    # argmin as min over ONE orderable LONG — enc = round(dist·1e6)·16
    # + cid. dist is already 6-dp-rounded and non-negative (squared
    # L2) and cid < {PQ_K}=16, so long order over enc IS the oracle's
    # ORDER BY dist, cid; the decode is exact because dist·1e6 is an
    # integer value ≪ 2^53 after the 6-dp round. The r14 min(struct)
    # form partial-combined map-side but planned as SortAggregate —
    # Catalyst's hash-aggregate buffer cannot hold a struct, so each
    # partition still sorted its candidate rows. A LONG min buffer is
    # hash-aggregable: the plan is HashAggregate→Exchange→
    # HashAggregate with no sort anywhere (guide §2.3
    # aggregate-before-shuffle; plan diff in
    # plans/r15/q_pq_quantize_{before,after}.txt)
    enc = F.round(F.col("dist") * 1e6).cast("long") * 16 + F.col("cid")
    best = d.groupBy("vec_id", "j").agg(F.min(enc).alias("e"))
    b_dist = F.shiftright(F.col("e"), 4).cast("double") / 1e6
    return best.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(e & 15, CAST(4 * j AS INT))")).cast("long").alias("pq_code"),
        F.sum(b_dist.cast("decimal(25,6)")).cast("double").alias("recon_err"),
    )


# ------------------------------------------------------- IVF-PQ search

SHORTLIST = 3 * TOP_K


def _pq_sqd(a, b):
    """6-dp-rounded squared L2 between two array columns — the one
    distance used by PQ coding, the ADC table, and both oracles."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def _explode_subs(df: DataFrame, vcol: str, out: str) -> DataFrame:
    """(row, j, subvector) rows from an array column: one explode of
    the PQ_M subspace slices."""
    jseq = F.sequence(F.lit(0), F.lit(PQ_M - 1))
    sub = lambda c, j: F.slice(c, j * PQ_DSUB + 1, PQ_DSUB)  # noqa: E731
    return df.select(
        *[c for c in df.columns if c != vcol],
        F.explode(
            F.transform(
                jseq,
                lambda j: F.struct(j.alias("j"), sub(F.col(vcol), j).alias(out)),
            )
        ).alias("s"),
    ).select(
        *[c for c in df.columns if c != vcol],
        F.col("s.j").alias("j"),
        F.col(f"s.{out}").alias(out),
    )


def _pq_codebook(t) -> DataFrame:
    """The pinned PQ codebook (first PQ_K corpus vectors)."""
    return t.embeddings.where(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("cid"),
        as_double_array("embedding").alias("cvec"),
    )


def pq_codes_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cid, codes array<int>) for EVERY corpus vector as a
    STORED LAYOUT partitioned by IVF cluster id — the ingest-time
    coding pass of an IVF-PQ index (faiss's `add`), built once per
    corpus via the durable catalog. Coding runs as one scan-local
    projection against the single-row broadcast codebook (argmin by
    (6-dp squared L2, cid) per subspace); queries then prune on
    ``cid`` and never touch full vectors until the exact rerank.
    4-bit codes × PQ_M=8 subspaces per 256-byte vector is the classic
    64× memory cut that makes billion-vector search RAM-resident."""

    def build() -> DataFrame:
        t = load_tables(spark, sf_dir)
        _, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
        subc = _explode_subs(_pq_codebook(t), "cvec", "csub")
        cbrow = (
            subc.groupBy("j")
            .agg(
                F.array_sort(F.collect_list(F.struct("cid", "csub"))).alias(
                    "e"
                )
            )
            .groupBy()
            .agg(F.array_sort(F.collect_list(F.struct("j", "e"))).alias("cbj"))
        )

        def code_at(j):
            vsub_j = F.slice(F.col("emb"), j * PQ_DSUB + 1, PQ_DSUB)
            entries = F.element_at(F.col("cbj"), (j + F.lit(1)).cast("int"))[
                "e"
            ]
            return F.array_min(
                F.transform(
                    entries,
                    lambda c: F.struct(
                        _pq_sqd(vsub_j, c["csub"]).alias("d"),
                        c["cid"].alias("cid"),
                    ),
                )
            )["cid"]

        return assigned.join(F.broadcast(cbrow)).select(
            "vec_id",
            F.array(*[code_at(j) for j in range(PQ_M)]).alias("codes"),
            "cid",
        )

    # recipe generation in the layout name (review r7, same staleness
    # class the sh_sig→sh_sig_p62 rename fixed): the stored codes
    # depend on the IVF geometry (N_CENTROIDS, KM_ITERS) and the PQ
    # codebook shape (PQ_M, PQ_K); changing any constant must key a
    # fresh layout, never silently reuse stale codes.
    layout = f"pq_codes_c{N_CENTROIDS}i{KM_ITERS}m{PQ_M}k{PQ_K}"
    return derived_table(
        spark, layout, sf_dir, build, partition_by=["cid"]
    )


@query(
    "q_ann_ivfpq",
    oracle=f"""
    WITH {_IVF_CHAIN},
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id = 0),
    probed AS (
      SELECT c.cid FROM {_IVF_CENTS} c, q
      ORDER BY round(list_cosine_similarity(c.cvec, q.qv), 6) DESC, c.cid
      LIMIT {N_PROBE}
    ),
    pv AS (
      SELECT a.vec_id, a.emb
      FROM {_IVF_ASG} a JOIN probed p ON a.cid = p.cid
    ),
    pqcents AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < {PQ_K}
    ),
    subc AS (
      SELECT cid, t.j,
             list_slice(cvec, t.j * {PQ_DSUB} + 1,
                        t.j * {PQ_DSUB} + {PQ_DSUB}) AS csub
      FROM pqcents, (SELECT unnest(range(0, {PQ_M})) AS j) t
    ),
    subv AS (
      SELECT vec_id, t.j,
             list_slice(emb, t.j * {PQ_DSUB} + 1,
                        t.j * {PQ_DSUB} + {PQ_DSUB}) AS vsub
      FROM pv, (SELECT unnest(range(0, {PQ_M})) AS j) t
    ),
    codes AS (
      SELECT vec_id, j, cid FROM (
        SELECT v.vec_id, v.j, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.j
                 ORDER BY {_SQDIST_DUCK.format(n=PQ_DSUB + 1)}, c.cid) AS rn
        FROM subv v JOIN subc c ON v.j = c.j
      ) WHERE rn = 1
    ),
    qsub AS (
      SELECT t.j, list_slice(q.qv, t.j * {PQ_DSUB} + 1,
                             t.j * {PQ_DSUB} + {PQ_DSUB}) AS vsub
      FROM q, (SELECT unnest(range(0, {PQ_M})) AS j) t
    ),
    lut AS (
      SELECT s.j, c.cid, {_SQDIST_DUCK.format(n=PQ_DSUB + 1)} AS ld
      FROM qsub s JOIN subc c ON s.j = c.j
    ),
    adists AS (
      SELECT k.vec_id,
             CAST(SUM(CAST(l.ld AS DECIMAL(25,6))) AS DOUBLE) AS adist
      FROM codes k JOIN lut l ON l.j = k.j AND l.cid = k.cid
      GROUP BY k.vec_id
    ),
    short AS (
      SELECT vec_id, adist FROM adists
      ORDER BY adist, vec_id LIMIT {SHORTLIST}
    )
    SELECT s.vec_id, s.adist,
           round(list_cosine_similarity(p.emb, q.qv), 6) AS sim
    FROM short s JOIN pv p ON p.vec_id = s.vec_id, q
    ORDER BY sim DESC, s.vec_id LIMIT {TOP_K}
    """,
)
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF-PQ search — the two stored-index halves
    (q_ann_ivf's learned partition-pruned probe, q_pq_quantize's
    4-bit product codes) composed into the billion-scale query shape:

    1. rank centroids, probe the top-2 clusters (index metadata, an
       8-row job inlined as a literal partition filter);
    2. score the probed vectors' STORED codes
       (:func:`pq_codes_table`, built once at ingest and partitioned
       by ``cid``) by asymmetric distance — the query builds one 8×16
       lookup table of subspace distances (broadcast), each
       candidate's approximate distance is 8 table lookups summed in
       the exact integer domain (6-dp distances × 1e6 as longs); the
       probe reads 4-byte codes, never vectors;
    3. shortlist 3k candidates by approximate distance (TakeOrdered),
       exact-rerank the shortlist by cosine, return the top-5.

    Only step 3 ever touches full vectors, so query RAM holds 32-bit
    codes instead of 256-byte vectors — the classic 64× memory cut,
    now reflected in the timed path too (r6 verdict item 4: coding
    used to run per query). Deterministic end-to-end (6-dp rounds,
    cid/vec_id tie-breaks, decimal ADC sums), so the whole pipeline —
    Lloyd's training included — replays exactly in the DuckDB
    oracle."""
    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    t = load_tables(spark, sf_dir)
    qv = _query_vec(t)
    probes = _probe_ids(cents, qv)

    subc = _explode_subs(_pq_codebook(t), "cvec", "csub")
    # Query ADC table packed into ONE broadcast row: entries sorted by
    # (j, cid); cids are 0..PQ_K-1 contiguous, so
    # element_at(arr, idx + 1) IS the table lookup. Lookup sums stay
    # in the INTEGER domain (each 6-dp subspace distance × 1e6 is an
    # exact long) so the fold is order-insensitive and bit-identical
    # to the oracle's DECIMAL(25,6) sum.
    qsub = _explode_subs(qv, "qv", "qsubv")
    lutrow = (
        qsub.join(subc, "j")
        .select(
            "j",
            "cid",
            F.round(_pq_sqd(F.col("qsubv"), F.col("csub")) * 1000000.0)
            .cast("long")
            .alias("ld"),
        )
        .groupBy("j")
        .agg(F.array_sort(F.collect_list(F.struct("cid", "ld"))).alias("lds"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("j", "lds"))).alias("lutj"))
    )

    # Codes come from the STORED layout (r6 verdict item 4: they used
    # to be recomputed over the probed vectors in the timed path —
    # ~0.4 s of per-query coding that a real index pays once at
    # ingest). The probe is a cid partition-filter on the codes table;
    # ADC per candidate is then PQ_M array lookups over 4-byte codes —
    # full vectors are touched only by the shortlist rerank below.
    codes_t = pq_codes_table(spark, sf_dir)
    pcodes = codes_t.where(F.col("cid").isin(probes)).select(
        "vec_id", "codes"
    )
    adist_int = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(F.col("lutj"), (j + F.lit(1)).cast("int"))["lds"],
            (F.element_at(F.col("codes"), (j + F.lit(1)).cast("int")) + F.lit(1)).cast(
                "int"
            ),
        )["ld"],
    )
    adists = pcodes.join(F.broadcast(lutrow)).select(
        "vec_id", (adist_int.cast("double") / 1000000.0).alias("adist")
    )
    short = adists.orderBy("adist", "vec_id").limit(SHORTLIST)
    pv = assigned.where(F.col("cid").isin(probes)).select("vec_id", "emb")
    return (
        short.join(pv, "vec_id")
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            "adist",
            F.round(cosine_sim(F.col("emb"), F.col("qv")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(TOP_K)
    )


# --------------------------------------------- retrieval rank quality


@query(
    "q_retrieval_ndcg",
    oracle=f"""
    WITH {_IVF_CHAIN},
    qs AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 100 = 1
    ),
    probed AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(c.cvec, q.qv), 6) DESC,
                          c.cid) AS rn
        FROM qs q, {_IVF_CENTS} c
      ) WHERE rn <= {N_PROBE}
    ),
    ivf AS (
      SELECT qid, vec_id, rn FROM (
        SELECT p.qid, a.vec_id,
               row_number() OVER (PARTITION BY p.qid
                 ORDER BY round(list_cosine_similarity(a.emb, q.qv), 6) DESC,
                          a.vec_id) AS rn
        FROM {_IVF_ASG} a JOIN probed p ON a.cid = p.cid
        JOIN qs q ON q.qid = p.qid
      ) WHERE rn <= {TOP_K}
    ),
    exact AS (
      SELECT qid, vec_id, rn, {TOP_K} + 1 - rn AS rel FROM (
        SELECT q.qid, e.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]), q.qv), 6) DESC,
                          e.vec_id) AS rn
        FROM embeddings e, qs q
      ) WHERE rn <= {TOP_K}
    ),
    dcg AS (
      SELECT i.qid,
             CAST(SUM(CAST(round(COALESCE(x.rel, 0) / log2(i.rn + 1), 6)
                           AS DECIMAL(25,6))) AS DOUBLE) AS dcg,
             COALESCE(round(CAST(1.0 AS DOUBLE) /
                            MIN(CASE WHEN x.rel IS NOT NULL
                                     THEN i.rn END), 6), 0.0) AS mrr
      FROM ivf i LEFT JOIN exact x ON x.qid = i.qid AND x.vec_id = i.vec_id
      GROUP BY i.qid
    ),
    idcg AS (
      SELECT qid,
             CAST(SUM(CAST(round(rel / log2(rn + 1), 6)
                           AS DECIMAL(25,6))) AS DOUBLE) AS idcg
      FROM exact GROUP BY qid
    )
    SELECT d.qid AS query_id,
           round(d.dcg / x.idcg, 6) AS ndcg_at_k,
           d.mrr
    FROM dcg d JOIN idcg x ON x.qid = d.qid
    """,
)
def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-quality audit of the IVF probe: nDCG@5 and MRR per query,
    graded relevance = position in the exhaustive top-5 (rel 5..1).
    Completes the retrieval scorecard next to q_ann_recall's set
    overlap — nDCG punishes the probe for returning right documents
    in the wrong ORDER, which recall cannot see; MRR is the
    time-to-first-relevant metric chat retrieval cares about
    (`app/vector_search.py:29-33` feeds top-3 straight into a
    prompt, so rank 1 vs rank 3 matters).

    Determinism across engines: per-position gains are rounded to
    6 dp BEFORE the decimal-exact sum, so double log2 noise cannot
    flip the aggregate; ranks carry vec_id tie-breaks. Plan shape:
    both arms reuse q_ann_recall's (broadcast query set, probed
    partitions vs one full scored pass with WindowGroupLimit);
    the metric rollup is a qid-keyed aggregate over ≤5 rows each."""
    probed, scored, rank = _audit_frames(spark, sf_dir)
    ivf = rank(
        scored.join(F.broadcast(probed), ["qid", "cid"]), "qid", "vec_id", "rn"
    )
    exact = rank(scored, "qid", "vec_id", "rn").withColumn(
        "rel", F.lit(TOP_K + 1) - F.col("rn")
    )

    gain = F.round(
        F.coalesce(F.col("rel"), F.lit(0)) / F.log2(F.col("i.rn") + 1), 6
    ).cast("decimal(25,6)")
    dcg = (
        ivf.alias("i")
        .join(
            exact.select("qid", "vec_id", "rel").alias("x"),
            ["qid", "vec_id"],
            "left",
        )
        .groupBy("qid")
        .agg(
            F.sum(gain).cast("double").alias("dcg"),
            F.coalesce(
                F.round(
                    1.0
                    / F.min(
                        F.when(F.col("rel").isNotNull(), F.col("i.rn"))
                    ),
                    6,
                ),
                F.lit(0.0),
            ).alias("mrr"),
        )
    )
    igain = F.round(F.col("rel") / F.log2(F.col("rn") + 1), 6).cast(
        "decimal(25,6)"
    )
    idcg = exact.groupBy("qid").agg(F.sum(igain).cast("double").alias("idcg"))
    return (
        dcg.join(idcg, "qid")
        .select(
            F.col("qid").alias("query_id"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"),
            "mrr",
        )
    )


@query(
    "q_ivf_balance",
    oracle=f"""
    WITH {_IVF_CHAIN}
    SELECT a.cid,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CAST(round(list_cosine_similarity(a.emb, c.cvec), 6)
                         AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS sum_sim_over_n,
           round(min(round(list_cosine_similarity(a.emb, c.cvec), 6)), 6)
             AS min_sim
    FROM {_IVF_ASG} a JOIN {_IVF_CENTS} c ON c.cid = a.cid
    GROUP BY a.cid
    """,
)
def q_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-health audit of the stored IVF layout: per-cluster
    occupancy, mean member-to-centroid cosine (cohesion), and the
    worst member — the metrics that tell an ANN deployment WHEN to
    retrain or split clusters. Occupancy skew is partition skew:
    a hot cluster makes every probe that touches it scan-heavy
    (the IVF analog of the salted-join problem), and falling
    cohesion means the codebook has drifted from the corpus. One
    scan of the assignment table joined to the broadcast centroid
    list, aggregated by cid; per-member sims are rounded then
    decimal-summed so the mean is order-insensitive and
    oracle-exact. At 100 TB this runs as the write-side observer of
    index ingest, like the DQ gates; [[q_ann_ivf_append]] reads the
    STORED copy of this frame as its drift baseline."""
    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    return _ivf_cohesion(cents, assigned, "n_vectors", "sum_sim_over_n")


def _ivf_cohesion(
    cents: DataFrame, members: DataFrame, n_name: str, mean_name: str
) -> DataFrame:
    """Per-cluster (count, decimal-exact mean member→centroid cosine,
    min cosine) — the shared cohesion aggregate of q_ivf_balance and
    q_ann_ivf_append, one broadcast join + one groupBy."""
    sim = F.round(cosine_sim(F.col("emb"), F.col("cvec")), 6)
    return (
        members.join(F.broadcast(cents), "cid")
        .select("cid", sim.alias("sim"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias(n_name),
            (
                F.sum(F.col("sim").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias(mean_name),
            F.round(F.min("sim"), 6).alias("min_sim"),
        )
    )


_APPEND_MOD = 10
_APPEND_REM = 7
# Arriving vectors get ids in a RESERVED namespace (base ids stay
# below it at every test SF): an O(1) literal, not a max(vec_id)+1
# corpus probe, so append stays O(batch) and the id rule is replayable
# in plain SQL. This offset is the DEMO's id allocator only — a
# production ingest's arrivals carry ids already unique by the
# upstream allocator (uuid/snowflake), and nothing downstream depends
# on the offset beyond non-collision.
_APPEND_ID_OFFSET = 1_000_000


def _append_batch(t) -> DataFrame:
    """The arriving vector batch (vec_id % 10 = 7 stands in, re-read
    RAW), re-identified into the reserved arriving-id namespace —
    shared by the append report and the base∪delta probe so the two
    can never disagree on what 'the batch' is."""
    return t.embeddings.where(
        F.col("vec_id") % _APPEND_MOD == _APPEND_REM
    ).select(
        (F.col("vec_id") + _APPEND_ID_OFFSET).alias("vec_id"),
        as_double_array("embedding").alias("emb"),
    )


# The arriving batch + its argmax assignment as oracle SQL — ONE
# definition shared by every oracle that replays the delta segment
# (q_ann_ivf_delta_probe, q_ann_ivf_merge, q_stream_ivf_append), so
# a change to the assignment rule (rounding, tie-break, offset) can
# never desynchronize one key's oracle from the Spark-side
# _append_batch/ivf_delta_segment pair it mirrors (review r11).
_APPEND_BATCH_CTES = f"""batch AS (
      SELECT vec_id + {_APPEND_ID_OFFSET} AS vec_id,
             CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id % {_APPEND_MOD} = {_APPEND_REM}
    ),
    dasg AS (
      SELECT vec_id, emb, cid FROM (
        SELECT b.vec_id, b.emb, c.cid,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.emb, c.cvec), 6)
                   DESC, c.cid) AS rn
        FROM batch b, {_IVF_CENTS} c
      ) WHERE rn = 1
    )"""


def ivf_delta_segment(
    spark: SparkSession, sf_dir: str, cents: DataFrame, batch: DataFrame
) -> DataFrame:
    """The cid-partitioned DELTA segment: the arriving batch assigned
    to the STORED centroids (broadcast scan-local argmax — no
    retrain, no corpus touch) and committed once beside the base
    assignment layout. Probes union base+delta; compaction folds the
    delta in at the next retrain."""
    return derived_table(
        spark,
        f"ivf8_delta_m{_APPEND_MOD}r{_APPEND_REM}o1m",
        sf_dir,
        lambda: with_cid(batch, F.col("emb"), cents).select(
            "vec_id", "emb", "cid"
        ),
        partition_by=["cid"],
    )


@query(
    "q_ann_ivf_append",
    oracle=f"""
    WITH {_IVF_CHAIN},
    batch AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id % {_APPEND_MOD} = {_APPEND_REM}
    ),
    dasg AS (
      SELECT vec_id, emb, cid FROM (
        SELECT b.vec_id, b.emb, c.cid,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.emb, c.cvec), 6)
                   DESC, c.cid) AS rn
        FROM batch b, {_IVF_CENTS} c
      ) WHERE rn = 1
    ),
    base AS (
      SELECT a.cid, CAST(count(*) AS BIGINT) AS n_base,
             CAST(SUM(CAST(round(list_cosine_similarity(a.emb, c.cvec), 6)
                           AS DECIMAL(25,6))) AS DOUBLE) / count(*)
               AS mean_sim_base
      FROM {_IVF_ASG} a JOIN {_IVF_CENTS} c ON c.cid = a.cid
      GROUP BY a.cid
    ),
    delta AS (
      SELECT d.cid, CAST(count(*) AS BIGINT) AS n_new,
             CAST(SUM(CAST(round(list_cosine_similarity(d.emb, c.cvec), 6)
                           AS DECIMAL(25,6))) AS DOUBLE) / count(*)
               AS mean_sim_new
      FROM dasg d JOIN {_IVF_CENTS} c ON c.cid = d.cid
      GROUP BY d.cid
    )
    SELECT b.cid, b.n_base,
           CAST(COALESCE(d.n_new, 0) AS BIGINT) AS n_new,
           round((b.n_base + COALESCE(d.n_new, 0))
                   / (SUM(b.n_base) OVER () + SUM(COALESCE(d.n_new, 0)) OVER ())
                 - b.n_base / SUM(b.n_base) OVER (), 6) AS occupancy_drift,
           b.mean_sim_base, d.mean_sim_new,
           round(d.mean_sim_new - b.mean_sim_base, 6) AS sim_drift
    FROM base b LEFT JOIN delta d ON d.cid = b.cid
    """,
)
def q_ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the assign-WITHOUT-rebuild
    path that closes the index lifecycle (build q_ann_ivf → probe
    q_knn_classify → health q_ivf_balance → compact
    q_compact_roundtrip → **append, here**). The reference's VS index
    is Delta-synced and ingests continuously (`app/vector_search.py:
    24-27`); this is that operator on the stored-layout index.

    An arriving batch (vectors with ``vec_id % 10 = 7`` stand in, the
    [[q_dedup_incremental]] treatment — re-read RAW, since at ingest
    the batch has no layout yet) is assigned to the STORED centroids
    by the same broadcast scan-local argmax the base build used
    (``with_cid`` — no shuffle, no corpus touch, no retrain) and
    committed as a cid-partitioned DELTA segment next to the base
    assignment layout; probes union base+delta partitions, compaction
    folds the delta in. Cost is O(batch) + O(k): the corpus is never
    re-scanned — the drift report joins the batch's per-cluster
    aggregates against the STORED health baseline
    (``ivf8_health``, the materialized [[q_ivf_balance]] frame)
    rather than recomputing base cohesion. Output per cluster:
    occupancy before/after drift and cohesion drift — the signals
    that decide when append-only degradation warrants a retrain.
    Oracle: DuckDB replays the identical trained codebook, batch
    argmax, and decimal-mean arithmetic, so the report is hash-exact;
    its base arm recomputes what the layout stores (same staleness
    treatment as [[q_dedup_from_layout]])."""
    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    t = load_tables(spark, sf_dir)
    delta = ivf_delta_segment(spark, sf_dir, cents, _append_batch(t))
    health = derived_table(
        spark,
        "ivf8_health",
        sf_dir,
        lambda: _ivf_cohesion(cents, assigned, "n_vectors", "sum_sim_over_n"),
    )
    base = health.select(
        "cid",
        F.col("n_vectors").alias("n_base"),
        F.col("sum_sim_over_n").alias("mean_sim_base"),
    )
    new = _ivf_cohesion(cents, delta, "n_new", "mean_sim_new").drop("min_sim")
    rep = base.join(new, "cid", "left").select(
        "cid",
        "n_base",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        "mean_sim_base",
        "mean_sim_new",
    )
    w = Window.partitionBy()  # k rows by construction — trivial window
    tot_b, tot_n = F.sum("n_base").over(w), F.sum("n_new").over(w)
    return rep.select(
        "cid",
        "n_base",
        "n_new",
        F.round(
            (F.col("n_base") + F.col("n_new")) / (tot_b + tot_n)
            - F.col("n_base") / tot_b,
            6,
        ).alias("occupancy_drift"),
        "mean_sim_base",
        "mean_sim_new",
        F.round(F.col("mean_sim_new") - F.col("mean_sim_base"), 6).alias(
            "sim_drift"
        ),
    )


@query(
    "q_ann_ivf_delta_probe",
    oracle=f"""
    WITH {_IVF_CHAIN},
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    probed AS (
      SELECT c.cid
      FROM {_IVF_CENTS} c, q
      ORDER BY round(list_cosine_similarity(c.cvec, q.qv), 6) DESC, c.cid
      LIMIT {N_PROBE}
    ),
    {_APPEND_BATCH_CTES},
    uni AS (
      SELECT vec_id, emb, cid FROM {_IVF_ASG}
      UNION ALL
      SELECT vec_id, emb, cid FROM dasg
    )
    SELECT u.vec_id,
           round(list_cosine_similarity(u.emb, q.qv), 6) AS sim
    FROM uni u JOIN probed p ON u.cid = p.cid, q
    ORDER BY sim DESC, u.vec_id
    LIMIT {TOP_K}
    """,
)
def q_ann_ivf_delta_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The probe half of incremental maintenance: top-{TOP_K} over
    the UNION of the base assignment layout and [[q_ann_ivf_append]]'s
    delta segment — appended vectors are searchable the moment their
    segment commits, with NO index rebuild. Both scans carry the same
    literal cid partition filter (the delta is cid-partitioned like
    the base, so pruning applies segment-by-segment — exactly how an
    IVF deployment probes base+delta posting lists), and the arriving
    batch's reserved id namespace (+{_APPEND_ID_OFFSET}) keeps the
    union well-keyed. On this demo batch every appended vector is a
    twin of a corpus member, so its sim equals its original's — the
    id tie-break makes the merged ranking deterministic and the
    oracle replays it exactly."""
    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    t = load_tables(spark, sf_dir)
    delta = ivf_delta_segment(spark, sf_dir, cents, _append_batch(t))
    qv = _query_vec(t)
    probes = _probe_ids(cents, qv)
    uni = assigned.where(F.col("cid").isin(probes)).unionByName(
        delta.where(F.col("cid").isin(probes))
    )
    return (
        uni.join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("emb"), F.col("qv")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


# Tombstoned deletes folded at merge time: ~4% of BASE members (a
# replayable id predicate stands in for an upstream delete feed; the
# vec_id < offset guard scopes it to the base namespace so arriving
# ids can never be swept by a base retention rule).
_MERGE_TOMB_MOD = 25
_MERGE_TOMB_REM = 11


@query(
    "q_ann_ivf_merge",
    oracle=f"""
    WITH {_IVF_CHAIN},
    {_APPEND_BATCH_CTES},
    uni AS (
      SELECT vec_id, emb, cid FROM {_IVF_ASG}
      UNION ALL
      SELECT vec_id, emb, cid FROM dasg
    ),
    merged AS (
      SELECT * FROM uni
      WHERE NOT (vec_id % {_MERGE_TOMB_MOD} = {_MERGE_TOMB_REM}
                 AND vec_id < {_APPEND_ID_OFFSET})
    ),
    agg AS (
      SELECT m.cid,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(SUM(CASE WHEN m.vec_id >= {_APPEND_ID_OFFSET}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_from_delta,
             CAST(SUM(m.vec_id) AS BIGINT) AS id_sum,
             CAST(SUM(CAST(round(list_cosine_similarity(m.emb, c.cvec), 6)
                           AS DECIMAL(25,6))) AS DOUBLE) / count(*)
               AS mean_sim
      FROM merged m JOIN {_IVF_CENTS} c ON c.cid = m.cid
      GROUP BY m.cid
    ),
    dels AS (
      SELECT cid, CAST(count(*) AS BIGINT) AS n_deleted
      FROM {_IVF_ASG}
      WHERE vec_id % {_MERGE_TOMB_MOD} = {_MERGE_TOMB_REM}
      GROUP BY cid
    )
    SELECT a.cid,
           CAST(1 AS BIGINT) AS n_files,
           a.n_total, a.n_from_delta,
           CAST(COALESCE(d.n_deleted, 0) AS BIGINT) AS n_deleted,
           a.id_sum, a.mean_sim
    FROM agg a LEFT JOIN dels d ON d.cid = a.cid
    """,
)
def q_ann_ivf_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index maintenance MERGE — the step that RETIRES the delta
    segment and applies tombstoned deletes, completing the lifecycle
    [[q_ann_ivf]] build → [[q_ann_ivf_append]] append →
    [[q_ann_ivf_delta_probe]] base∪delta probe → **merge, here** (the
    OPTIMIZE analog [[q_compact_roundtrip]] performs for the fact
    table, applied to the vector index; the reference's Delta-synced
    VS index, `app/vector_search.py:24-27`, runs this fold
    continuously server-side).

    base ∪ delta minus the tombstone set (a replayable base-namespace
    id predicate standing in for an upstream delete feed) is
    committed as a NEW cid-partitioned generation with exactly ONE
    file per cluster — after a merge, a probe touching P clusters
    opens P files instead of P×(1+segments). The report reads the
    WRITTEN generation back and pins, per cluster: the physical file
    count (countDistinct over ``_metadata.file_path`` vs the oracle's constant
    1 — the [[q_compact_roundtrip]] treatment, so the match fails
    unless each cluster really folded to one file), membership
    (n_total/id_sum — a row lost or doubled in the rewrite
    hash-mismatches), provenance (n_from_delta via the reserved id
    namespace), the deletes applied (n_deleted, recomputed from the
    base layout), and post-merge cohesion (decimal-exact mean
    member→centroid cosine, the [[q_ivf_balance]] arithmetic).

    At 100 TB: the merge reads only base+delta assignment layouts
    (never raw text/embeddings beyond the stored vectors), shuffles
    ONCE on cid (each output file written by one task), and the
    tombstone anti-join is a broadcast at realistic delete-feed
    sizes. Cost is O(index), amortized across the appends it folds —
    and probes never pay a per-segment penalty again."""
    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    t = load_tables(spark, sf_dir)
    delta = ivf_delta_segment(spark, sf_dir, cents, _append_batch(t))
    # plain %, NOT pmod: the predicate must mirror the ORACLE's %,
    # and Spark's and DuckDB's % share sign-following semantics — a
    # pmod here would silently diverge on negative ids (the
    # fingerprint_pairs salt went the other way because it is
    # engine-internal with no oracle twin)
    tombstoned = (
        F.col("vec_id") % _MERGE_TOMB_MOD == _MERGE_TOMB_REM
    )

    def build() -> DataFrame:
        uni = assigned.select("vec_id", "emb", "cid").unionByName(
            delta.select("vec_id", "emb", "cid")
        )
        keep = uni.where(
            ~(tombstoned & (F.col("vec_id") < _APPEND_ID_OFFSET))
        )
        # strict hash repartition on cid: every cluster lands wholly
        # in one task, so partitionBy(cid) commits ONE file per
        # cluster (AQE may coalesce tasks but never splits a key)
        return keep.repartition(F.col("cid"))

    merged = derived_table(
        spark,
        f"ivf8_merged_m{_APPEND_MOD}r{_APPEND_REM}"
        f"_t{_MERGE_TOMB_MOD}r{_MERGE_TOMB_REM}",
        sf_dir,
        build,
        partition_by=["cid"],
    )
    agg = (
        merged.withColumn("fpath", F.col("_metadata.file_path"))
        .join(F.broadcast(cents), "cid")
        .groupBy("cid")
        .agg(
            F.countDistinct("fpath").alias("n_files"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                (F.col("vec_id") >= _APPEND_ID_OFFSET).cast("long")
            ).alias("n_from_delta"),
            F.sum("vec_id").cast("long").alias("id_sum"),
            (
                F.sum(
                    F.round(cosine_sim(F.col("emb"), F.col("cvec")), 6)
                    .cast("decimal(25,6)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_sim"),
        )
    )
    dels = (
        assigned.where(tombstoned)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_deleted"))
    )
    return agg.join(dels, "cid", "left").select(
        "cid",
        "n_files",
        "n_total",
        "n_from_delta",
        F.coalesce("n_deleted", F.lit(0)).cast("long").alias("n_deleted"),
        "id_sum",
        "mean_sim",
    )


# ------------------------------------------- centroid re-train

# Occupancy-skew gate: retrain fires when the hottest cluster holds
# ≥ (RETRAIN_NUM/RETRAIN_DEN) × the mean occupancy, compared as the
# INTEGER cross-multiplication max_n · k · DEN ≥ NUM · total so both
# engines evaluate the exact same BIGINT predicate (advice r12: a
# double 1.03 literal in Spark vs DECIMAL(3,2) in DuckDB flips at
# exact boundary equality, e.g. total=800 max_n=103). 1.03 trips on
# the test corpora (measured skew 1.04–1.15 across sf0.001–0.1); a
# perfectly balanced index yields an empty moved set in BOTH engines —
# the gate arithmetic rides in-band and the oracle replays it, so the
# key stays exact either way.
RETRAIN_NUM = 103
RETRAIN_DEN = 100
RETRAIN_RATIO = RETRAIN_NUM / RETRAIN_DEN  # display/test convenience

_RETRAIN_CHAIN, _RETRAIN_CENTS, _RETRAIN_ASG = lloyd_sql(
    N_CENTROIDS, KM_ITERS + 1
)


@query(
    "q_ann_ivf_retrain",
    oracle=f"""
    WITH {_RETRAIN_CHAIN},
    occ AS (
      SELECT cid, CAST(count(*) AS BIGINT) AS n
      FROM {_IVF_ASG} GROUP BY cid
    ),
    gate AS (
      SELECT max(n) * {N_CENTROIDS} * {RETRAIN_DEN} >= {RETRAIN_NUM} * SUM(n)
        AS fires
      FROM occ
    )
    SELECT o.vec_id, o.cid AS old_cid, n.cid AS new_cid,
           round(list_cosine_similarity(o.emb, co.cvec), 6) AS sim_old,
           round(list_cosine_similarity(o.emb, cn.cvec), 6) AS sim_new
    FROM {_IVF_ASG} o
    JOIN {_RETRAIN_ASG} n ON n.vec_id = o.vec_id AND n.cid <> o.cid
    JOIN {_IVF_CENTS} co ON co.cid = o.cid
    JOIN {_RETRAIN_CENTS} cn ON cn.cid = n.cid
    CROSS JOIN gate g
    WHERE g.fires
    """,
)
def q_ann_ivf_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index maintenance RE-TRAIN — the last lifecycle op after
    [[q_ann_ivf]] build / [[q_ann_ivf_append]] / [[q_ann_ivf_merge]]:
    when [[q_ivf_balance]]'s occupancy gauge flags skew, run ONE
    bounded Lloyd round SEEDED FROM THE STORED CENTROIDS and report
    exactly the vectors whose nearest centroid changed — the minimal
    re-assignment set a 100 TB index would physically move (the
    reference's managed VS index performs this upkeep server-side,
    `app/vector_search.py:24-27`).

    O(index), never O(corpus-from-scratch): the stored assignment IS
    the seeded round's assign step (every member already sits with
    its argmax-cosine centroid), so the retrained codebook is ONE
    fixed-point mean aggregate over the stored ``(cid, emb)`` layout
    (:func:`lloyd_means`), and re-assignment is the broadcast-packed
    argmax projection of :func:`with_cid` over the same layout. The
    raw embeddings table is never read — the plan test pins the scan
    set to the layout. The skew gate rides in-band (a 1-row broadcast
    cross-join), so a balanced index short-circuits to an empty moved
    set identically in both engines.

    Exact oracle: seeding Lloyd's from the stored round-K centroids
    equals extending training by one round, so the oracle is simply
    the shared :func:`lloyd_sql` chain at ``KM_ITERS + 1`` — the
    moved set is ``asg_K ⋈ asg_{{K+1}}`` on changed cid, with
    member→centroid cosines against both generations' codebooks. The
    skew gate rides in-band (a 1-row broadcast cross-join the oracle
    replays in its WHERE) — a collect-the-metadata variant was A/B'd
    and lost (0.87 vs 1.20 s min-of-4 interleaved at sf0.1: the
    driver round-trip + literal re-upload costs more than the
    checkpointed in-band aggregate), so a balanced index
    short-circuits to an empty moved set via the gate join."""
    cents, assigned = ivf_index(spark, sf_dir, "ivf8", N_CENTROIDS, KM_ITERS)
    # retrained codebook AND occupancy out of ONE pass over the stored
    # assignment (lloyd_means with_n), materialized once (lloyd_cents'
    # per-round treatment) because it feeds the re-assignment
    # broadcast, the sim_new join, and the gate — which aggregates the
    # k checkpointed rows instead of re-scanning the layout
    meta = lloyd_means(
        assigned.select("cid", "emb"), with_n=True
    ).localCheckpoint(eager=True)
    gate = meta.agg(
        (
            F.max("n") * N_CENTROIDS * RETRAIN_DEN
            >= F.lit(RETRAIN_NUM) * F.sum("n")
        ).alias("fires")
    )
    cents2 = meta.select("cid", "cvec")
    re = with_cid(
        assigned.select("vec_id", "emb", F.col("cid").alias("old_cid")),
        F.col("emb"),
        cents2,
    ).withColumnRenamed("cid", "new_cid")
    moved = re.where(F.col("new_cid") != F.col("old_cid"))
    sim_old = F.round(cosine_sim(F.col("emb"), F.col("old_cvec")), 6)
    sim_new = F.round(cosine_sim(F.col("emb"), F.col("new_cvec")), 6)
    return (
        moved.join(
            F.broadcast(
                cents.select(
                    F.col("cid").alias("old_cid"),
                    F.col("cvec").alias("old_cvec"),
                )
            ),
            "old_cid",
        )
        .join(
            F.broadcast(
                cents2.select(
                    F.col("cid").alias("new_cid"),
                    F.col("cvec").alias("new_cvec"),
                )
            ),
            "new_cid",
        )
        .join(F.broadcast(gate))
        .where(F.col("fires"))
        .select(
            "vec_id",
            "old_cid",
            "new_cid",
            sim_old.alias("sim_old"),
            sim_new.alias("sim_new"),
        )
    )


# ---------------------------------------- hyperplane (cosine) LSH

HP_BITS = 16
HP_BAND_BITS = 8
HP_TAU = 0.35

_HP_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, len(h) + 1), "
    "i -> CAST(embedding[i] AS DOUBLE) * h[i])), (acc, x) -> acc + x)"
)


@query(
    "q_ann_hyperplane",
    oracle=f"""
    WITH hp AS (
      SELECT vec_id AS j, CAST(embedding AS DOUBLE[]) AS h
      FROM embeddings WHERE vec_id < {HP_BITS}
    ),
    sk AS (
      SELECT e.vec_id,
             CAST(SUM(CASE WHEN round({_HP_DOT}, 6) >= 0
                           THEN (1 << j) ELSE 0 END) AS BIGINT) AS sketch
      FROM embeddings e, hp
      GROUP BY e.vec_id
    ),
    b0 AS (SELECT vec_id, sketch & 255 AS v FROM sk),
    b1 AS (SELECT vec_id, (sketch >> 8) & 255 AS v FROM sk),
    cands AS (
      SELECT DISTINCT a_id, b_id FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM b0 a JOIN b0 b ON a.v = b.v AND a.vec_id < b.vec_id
        UNION ALL
        SELECT a.vec_id, b.vec_id
        FROM b1 a JOIN b1 b ON a.v = b.v AND a.vec_id < b.vec_id
      )
    )
    SELECT c.a_id, c.b_id,
           round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                        CAST(eb.embedding AS DOUBLE[])), 6)
             AS sim
    FROM cands c
    JOIN embeddings ea ON ea.vec_id = c.a_id
    JOIN embeddings eb ON eb.vec_id = c.b_id
    WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                       CAST(eb.embedding AS DOUBLE[])), 6)
          >= {HP_TAU}
    """,
)
def q_ann_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (sign-of-dot) LSH for cosine similarity —
    the classic Charikar sketch, hand-rolled so it is EXACT-oracle
    (the MLlib variant q_ann_brp_lsh stays rows-only because its
    hash tables are library-private). Each vector folds to a
    {HP_BITS}-bit sketch (bit j = sign of its dot with hyperplane j;
    hyperplanes are the first {HP_BITS} corpus vectors — the corpus
    is zero-centered, so they are usable random directions, and both
    engines can rebuild them), candidates come from two
    {HP_BAND_BITS}-bit band-bucket equi-joins, and only candidates
    pay the exact cosine (≥ {HP_TAU} kept). The sketch is a STORED
    LAYOUT (8 bytes/doc) like the rest of the dedup tier; sketching
    is one scan-local projection against the broadcast hyperplane
    pack. P[bit collision] = 1 − θ/π per bit, so band width and bit
    count tune recall exactly like MinHash bands — at 10⁹ vectors
    you widen the sketch to ~64 bits and keep the same plan."""
    from lakehouse_app_spark.sources.layout import derived_table

    t = load_tables(spark, sf_dir)

    def build() -> DataFrame:
        hp = t.embeddings.where(F.col("vec_id") < HP_BITS).select(
            F.col("vec_id").cast("int").alias("j"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(vec_id AS INT))"
            ).alias("bitval"),
            as_double_array("embedding").alias("h"),
        )
        packed = hp.agg(
            F.array_sort(F.collect_list(F.struct("j", "bitval", "h"))).alias(
                "hps"
            )
        )
        from lakehouse_app_spark.operators.vectors import dot

        sketch = F.aggregate(
            F.col("hps"),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.when(
                F.round(dot(F.col("emb"), s["h"]), 6) >= 0, s["bitval"]
            ).otherwise(F.lit(0).cast("long")),
        )
        return (
            spread(t.embeddings)
            .select("vec_id", as_double_array("embedding").alias("emb"))
            .join(F.broadcast(packed))
            .select("vec_id", sketch.alias("sketch"))
        )

    sk = derived_table(spark, "hp_sketch", sf_dir, build)
    mask = (1 << HP_BAND_BITS) - 1
    # single-scan posexplode over the band values (the unioned
    # formulation re-read the sketch layout once per band)
    band_arr = F.array(
        *[
            F.shiftright(F.col("sketch"), i * HP_BAND_BITS).bitwiseAND(
                F.lit(mask)
            )
            for i in range(HP_BITS // HP_BAND_BITS)
        ]
    )
    buckets = sk.select("vec_id", F.posexplode(band_arr).alias("band", "v"))
    a = buckets.select(F.col("vec_id").alias("a_id"), "band", "v")
    b = buckets.select(F.col("vec_id").alias("b_id"), "band", "v")
    cand = (
        a.join(b, ["band", "v"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates()
    )
    from lakehouse_app_spark.operators.vectors import dot, l2_norm

    # per-vector norms hoisted (the _sides pattern): each candidate
    # pair costs ONE dot fold instead of three, and sim is computed
    # once (filter reads the projected column). Arithmetic tree is
    # identical to cosine_sim, so the oracle still matches.
    emb = t.embeddings.select(
        "vec_id",
        as_double_array("embedding").alias("e"),
        l2_norm(as_double_array("embedding")).alias("nrm"),
    )
    sim = F.round(
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        cand.join(
            emb.select(
                F.col("vec_id").alias("a_id"),
                F.col("e").alias("ea"),
                F.col("nrm").alias("na"),
            ),
            "a_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("b_id"),
                F.col("e").alias("eb"),
                F.col("nrm").alias("nb"),
            ),
            "b_id",
        )
        .select("a_id", "b_id", sim.alias("sim"))
        .where(F.col("sim") >= HP_TAU)
    )
