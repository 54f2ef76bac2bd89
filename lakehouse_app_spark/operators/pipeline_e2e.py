"""End-to-end corpus-preparation pipeline as ONE declarative plan.

The reference assembles its per-session processing as a composed
chain (`app/app.py:74-83` — branches piped into a single runnable);
the engine analog is stage composition at the LOGICAL PLAN level:
quality gate ([[q_corpus_gate]]) ∩ model-based filter
([[q_quality_classifier]]) ∩ exact-dup representatives
([[q_minhash_sig]]'s tier via ``rep_docs``) → deterministic split →
per-split doc/token balance. Each stage stays an independent,
separately-oracled operator; this module only JOINS their outputs,
so Catalyst fuses the whole pipeline into one DAG — no temp tables,
no materialization between stages.

The oracle composes the very same stage SQL out of the registry
(parenthesized-subquery nesting), so the composition itself — not
just the stages — is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_app_spark.operators.corpus_prep import q_corpus_gate  # noqa: F401 — oracle composition
from lakehouse_app_spark.operators.dedup import spread
from lakehouse_app_spark.operators.dedup_ext import q_dedup_incremental
from lakehouse_app_spark.operators.quality import q_quality_classifier  # noqa: F401 — oracle composition
from lakehouse_app_spark.registry import ORACLES, query
from lakehouse_app_spark.sources.tables import load_tables


def _pipeline_oracle() -> str:
    gate = ORACLES["q_corpus_gate"]
    clf = ORACLES["q_quality_classifier"]
    return f"""
    WITH gatek AS (
      SELECT doc_id FROM ({gate}) g WHERE g.keep
    ),
    clfk AS (
      SELECT doc_id FROM ({clf}) c WHERE c.keep
    ),
    reps AS (
      SELECT min(doc_id) AS doc_id FROM (
        SELECT doc_id,
               array_to_string(list_sort(list_distinct(
                 string_split(text, ' '))), ' ') AS fp
        FROM documents
      ) GROUP BY fp
    ),
    kept AS (
      SELECT d.doc_id,
             len(string_split(d.text, ' ')) AS n_tok,
             (CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) + 1) / 4294967297.0 AS u
      FROM documents d
      JOIN gatek USING (doc_id)
      JOIN clfk USING (doc_id)
      JOIN reps USING (doc_id)
    )
    SELECT CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM kept GROUP BY 1
    """


@query("q_corpus_pipeline", oracle=_pipeline_oracle())
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole preprocessing pipeline, one plan: rule gate ∩
    linear-classifier filter ∩ exact-dedup representatives, then the
    md5-deterministic 80/10/10 split and the per-split doc/token
    balance a dataset release reports.

    Composition is at the EXPRESSION level (r15 optimization, guide
    §7.2): all three stage decisions are functions of one document
    row — the gate predicate is ``gate_features``' own expression
    tree (the identical tree q_corpus_gate plans), the classifier
    logit folds the broadcast weight TABLE into the equivalent
    closed-form weight EXPRESSION over the same hashed features
    (wt(fid) = (fid·A) mod M − S is exactly the table's generating
    rule, so Σwt is bit-identical to the join form), and the
    exact-dedup representative is min(doc_id) per fingerprint — a
    window over the same xxhash64 fingerprint rep_docs aggregates.
    One corpus scan and one narrow shuffle (8-byte fingerprint keys +
    3 scalars) replace the joined form's four scans and three
    doc_id-keyed shuffles; nothing document-sized crosses any
    exchange. The stages remain independently-oracled operators, and
    the composed ORACLE still nests their registry SQL — the hash
    match proves the fused plan ≡ the stage composition. At 100 TB
    the same fusion is what a one-shot build wants; teams owning
    tiers separately run the standalone operators with stored
    intermediates."""
    from lakehouse_app_spark.operators.corpus_prep import (
        _FP_SPARK,
        gate_features,
    )
    from lakehouse_app_spark.operators.quality import (
        _QC_A,
        _QC_D,
        _QC_M,
        _QC_SCALE,
    )

    t = load_tables(spark, sf_dir)
    cols, ok = gate_features("doc_id")
    tok_fp = _FP_SPARK.format(w="tk")
    clf_raw = F.expr(
        f"aggregate(array_distinct(split(lower(text), ' ')), "
        f"CAST(0 AS BIGINT), (acc, tk) -> acc + "
        f"(((({tok_fp}) % {_QC_D}) * {_QC_A}) % {_QC_M} - {_QC_SCALE}))"
    )
    fp = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " "
    )
    base = spread(t.documents).select(
        *cols,
        F.xxhash64(fp).alias("fph"),
        (clf_raw > 0).alias("clf_keep"),
    )
    rep = F.min("doc_id").over(Window.partitionBy("fph"))
    hex8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    u = (F.conv(hex8, 16, 10).cast("double") + 1) / F.lit(4294967297.0)
    split = (
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    )
    kept = (
        base.withColumn("rep_id", rep)
        .where(ok & F.col("clf_keep") & (F.col("doc_id") == F.col("rep_id")))
        .select(split.alias("split"), F.col("n_tokens").alias("n_tok"))
    )
    return kept.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )


def _ingest_oracle() -> str:
    incr = ORACLES["q_dedup_incremental"]
    return f"""
    WITH quar AS (
      SELECT DISTINCT new_id AS doc_id FROM ({incr}) qq
    ),
    j AS (
      SELECT b.source,
             len(string_split(b.text, ' ')) AS n_tok,
             (q.doc_id IS NOT NULL) AS quarantined
      FROM documents b LEFT JOIN quar q USING (doc_id)
      WHERE b.doc_id % 10 = 7
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_batch,
           CAST(SUM(CASE WHEN quarantined THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           CAST(SUM(CASE WHEN quarantined THEN 0 ELSE 1 END) AS BIGINT)
             AS n_committed,
           CAST(SUM(CASE WHEN quarantined THEN 0 ELSE n_tok END) AS BIGINT)
             AS committed_tokens
    FROM j GROUP BY source
    """


@query("q_ingest_pipeline", oracle=_ingest_oracle())
def q_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE-side ingest composition, end to end and hash-checked
    (round-9 verdict item 5): an arriving batch (doc_id % 10 = 7, as
    in [[q_dedup_incremental]]) is screened against the standing
    corpus's STORED signatures — banded candidates are quarantined —
    and the survivors are committed through the DQ-gated manifest-
    last snapshot protocol (`write_snapshot_checked`: one aggregate
    pass proves every row satisfies the gate or nothing lands).
    The returned per-source report reads n_committed/committed_tokens
    BACK FROM THE COMMITTED SNAPSHOT, so the oracle's hash check
    covers the quarantine decision AND the commit round-trip, not
    just the plan.

    Scale: work is batch-sized throughout — corpus text is never
    read (signatures only), the quarantine join ships 16-byte
    signatures, the DQ gate is one aggregate over the batch, and the
    snapshot write is the batch itself. The standing 100 TB corpus
    participates via its signature layout alone."""
    from lakehouse_app_spark.runtime_cache import (
        scoped_persist,
        scratch_commit_dir,
    )
    from lakehouse_app_spark.sources.sinks import (
        read_snapshot,
        write_snapshot_checked,
    )

    t = load_tables(spark, sf_dir)
    batch = t.documents.where(F.col("doc_id") % 10 == 7)
    # persist: the quarantine list feeds BOTH the semi (flagged) and
    # anti (admitted) joins — unpersisted, the whole signature-band
    # candidate pipeline would execute twice. Broadcast: it's a
    # candidate-id list (banded near-dups of one batch), metadata-
    # sized next to the batch at any corpus scale.
    quar = scoped_persist(
        q_dedup_incremental(spark, sf_dir)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    flagged = batch.join(F.broadcast(quar), "doc_id", "left_semi")
    admitted = batch.join(F.broadcast(quar), "doc_id", "left_anti")
    path = scratch_commit_dir("ingest_commit_")
    write_snapshot_checked(
        admitted.select("doc_id", "source", "text", "n_chars"),
        path,
        checks={
            "doc_id_present": F.col("doc_id").isNotNull(),
            "text_present": F.col("text").isNotNull(),
            "n_chars_positive": F.col("n_chars") >= 1,
            "batch_invariant": F.col("doc_id") % 10 == 7,
        },
        note="ingest batch commit (near-dup quarantine applied)",
    )
    committed = read_snapshot(spark, path)
    commit_agg = committed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_committed"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias(
            "committed_tokens"
        ),
    )
    batch_agg = batch.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_batch")
    )
    quar_agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_quarantined")
    )
    return (
        batch_agg.join(quar_agg, "source", "left")
        .join(commit_agg, "source", "left")
        .select(
            "source",
            "n_batch",
            F.coalesce("n_quarantined", F.lit(0).cast("long")).alias(
                "n_quarantined"
            ),
            F.coalesce("n_committed", F.lit(0).cast("long")).alias(
                "n_committed"
            ),
            F.coalesce("committed_tokens", F.lit(0).cast("long")).alias(
                "committed_tokens"
            ),
        )
    )
