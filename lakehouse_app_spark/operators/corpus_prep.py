"""Training-data preparation operators: the corpus-to-training-set
pipeline stage.

The reference retrieves and post-processes documents for an LLM
(`app/vector_search.py:29-33`, `app/app.py:111-124`); this module is
the upstream counterpart a production corpus needs before any of that
is worth running — C4-style quality gating, LM-based scoring,
deterministic train/val/test splitting, token-offset sharding,
source-weighted mixing, URL parsing, PII redaction, and
exact-checkable MinHash signatures.

Every operator is pure Catalyst expression work (higher-order
functions, windows, hash-aggregates) — no Python in the hot path. All
randomness is md5-derived (the [[q_sample_hash]] convention), so every
decision here is reproducible across engines, re-runs, and
re-partitioning — the property that keeps a 100 TB training set
auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables

# ------------------------------------------------------------------ gate

# C4-style filter thresholds (Raffel et al. 2020 use sentence/word
# heuristics; these are the same shape over this corpus's features).
MIN_TOKENS = 12
MAX_TOKENS = 400
MIN_STOP_RATIO = 0.03
MIN_AVG_TOKLEN = 2.5
MAX_AVG_TOKLEN = 8.0


def gate_features(*extra_cols: str):
    """The C4 gate's feature projection over ``documents`` —
    (n_tokens, avg_token_len, stop_ratio) plus any pass-through
    columns — and the keep predicate, shared by [[q_corpus_gate]]
    and [[q_dataset_card]] so the gate recipe (stopword list
    included) lives in exactly one Spark expression tree."""
    tk = F.split(F.col("text"), " ")
    n_tokens = F.size(tk).cast("long")
    n_spaces = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    n_stop = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), " "),
            lambda w: w.isin("the", "a", "value"),
        )
    )
    cols = [
        *extra_cols,
        n_tokens.alias("n_tokens"),
        ((F.length("text") - n_spaces) / F.size(tk)).alias("avg_token_len"),
        (n_stop / F.size(tk)).alias("stop_ratio"),
    ]
    ok = (
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS)
        & (F.col("stop_ratio") >= MIN_STOP_RATIO)
        & (F.col("avg_token_len") >= MIN_AVG_TOKLEN)
        & (F.col("avg_token_len") <= MAX_AVG_TOKLEN)
    )
    return cols, ok


@query(
    "q_corpus_gate",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             (length(text) - (length(text) - length(replace(text, ' ', ''))))
               / len(string_split(text, ' ')) AS avg_token_len,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t = 'the' OR t = 'a' OR t = 'value'))
               / len(string_split(text, ' ')) AS stop_ratio
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
                WHEN n_tokens > {MAX_TOKENS} THEN 'too_long'
                WHEN stop_ratio < {MIN_STOP_RATIO} THEN 'low_stopword'
                WHEN avg_token_len < {MIN_AVG_TOKLEN}
                     OR avg_token_len > {MAX_AVG_TOKLEN} THEN 'weird_tokens'
                ELSE 'keep' END AS reason,
           CASE WHEN n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}
                     AND stop_ratio >= {MIN_STOP_RATIO}
                     AND avg_token_len >= {MIN_AVG_TOKLEN}
                     AND avg_token_len <= {MAX_AVG_TOKLEN}
                THEN TRUE ELSE FALSE END AS keep
    FROM m
    """,
)
def q_corpus_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus quality gate: every document gets a keep/drop
    decision plus the FIRST failing rule as an audit reason — the
    filter step a pretraining pipeline runs before tokenization.
    Thresholds compare unrounded doubles, but both engines build the
    identical expression tree over identical integers, so the
    comparison is bit-deterministic. Pure map work: at 100 TB this is
    a scan-local projection with zero shuffle."""
    t = load_tables(spark, sf_dir)
    cols, ok = gate_features("doc_id")
    m = t.documents.select(*cols)
    reason = (
        F.when(F.col("n_tokens") < MIN_TOKENS, "too_short")
        .when(F.col("n_tokens") > MAX_TOKENS, "too_long")
        .when(F.col("stop_ratio") < MIN_STOP_RATIO, "low_stopword")
        .when(
            (F.col("avg_token_len") < MIN_AVG_TOKLEN)
            | (F.col("avg_token_len") > MAX_AVG_TOKLEN),
            "weird_tokens",
        )
        .otherwise("keep")
    )
    return m.select(
        "doc_id", "n_tokens", reason.alias("reason"), ok.alias("keep")
    )


# ------------------------------------------------------------- perplexity


@query(
    "q_perplexity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ), pairs AS (
      SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
      FROM tok, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
      WHERE len(ts) >= 2
    ), c2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, CAST(SUM(c) AS BIGINT) AS tot FROM c2 GROUP BY 1
    ), scored AS (
      SELECT p.doc_id, c2.c / c1.tot AS prob
      FROM pairs p
      JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
      JOIN c1 ON p.w1 = c1.w1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(CAST(-ln(prob) AS DECIMAL(25,12))) AS DOUBLE)
                 / count(*), 6) AS avg_nll,
           round(exp(CAST(SUM(CAST(-ln(prob) AS DECIMAL(25,12))) AS DOUBLE)
                     / count(*)), 3) AS ppl
    FROM scored GROUP BY doc_id
    """,
)
def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document pseudo-perplexity under the corpus's own bigram
    LM — the model-based quality signal (CCNet-style) that ranks
    documents for training-data curation. The LM table is a STORED
    LAYOUT (trained once per corpus — a language model is a standing
    artifact, not per-scoring work; at 100 TB it is vocab², orders of
    magnitude smaller than the corpus, and broadcastable); scoring is
    one pair-explode of the docs joined against the stored table. The
    per-doc log-prob sum is decimal-cast so accumulation order can't
    diverge between engines ([[q_entropy_kl]] convention)."""
    from lakehouse_app_spark.operators.dedup import spread
    from lakehouse_app_spark.sources.layout import derived_table

    t = load_tables(spark, sf_dir)

    def doc_pairs() -> DataFrame:
        return (
            spread(t.documents)
            .select("doc_id", F.split(F.lower(F.col("text")), " ").alias("ts"))
            .where(F.size("ts") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ts) - 1),"
                        " i -> struct(ts[i-1] AS w1, ts[i] AS w2))"
                    )
                ).alias("p"),
            )
            .select("doc_id", "p.w1", "p.w2")
        )

    def train_lm() -> DataFrame:
        c2 = doc_pairs().groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
        c1 = c2.groupBy("w1").agg(F.sum("c").alias("tot"))
        return c2.join(c1, "w1").select(
            "w1", "w2", (F.col("c") / F.col("tot")).alias("prob")
        )

    lm = derived_table(spark, "bigram_lm", sf_dir, train_lm)
    scored = doc_pairs().join(F.broadcast(lm), ["w1", "w2"]).select("doc_id", "prob")
    nll_sum = F.sum((-F.log("prob")).cast("decimal(25,12)")).cast("double")
    n = F.count(F.lit(1))
    return scored.groupBy("doc_id").agg(
        n.alias("n_bigrams"),
        F.round(nll_sum / n, 6).alias("avg_nll"),
        F.round(F.exp(nll_sum / n), 3).alias("ppl"),
    )


# ------------------------------------------------------------ train split


@query(
    "q_train_split",
    oracle="""
    WITH assigned AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_tok,
             (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) + 1) / 4294967297.0 AS u
      FROM documents
    )
    SELECT CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY 1, 2
    """,
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split via an md5-derived
    uniform on the document key — the same rows land in the same split
    on any engine, any partitioning, any rerun ([[q_sample_hash]]),
    which is what makes a split reproducible enough to publish with a
    model. Reported as per-(split, lang) doc and token counts — the
    balance sheet that catches language skew between splits."""
    t = load_tables(spark, sf_dir)
    hex8 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    u = (F.conv(hex8, 16, 10).cast("double") + 1) / F.lit(4294967297.0)
    split = (
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    )
    return (
        t.documents.select(
            split.alias("split"),
            "lang",
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


# ----------------------------------------------------------- token packing

PACK_BUDGET = 2000  # tokens per shard
PACK_BUCKET = 100  # doc_ids per prefix-sum bucket


@query(
    "q_pack_batches",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, n_tok,
             SUM(n_tok) OVER (ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM m
    )
    SELECT CAST(floor((cum - n_tok) / {PACK_BUDGET}) AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1
    """,
)
def q_pack_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-offset sharding: documents in key order are packed into
    contiguous ~{PACK_BUDGET}-token shards by their global token
    offset — how pretraining corpora are cut into fixed-budget
    sequences. The oracle states the spec as one global running sum;
    the Spark side computes the SAME prefix sum scalably: a
    per-bucket running sum (windows over doc_id DIV {PACK_BUCKET}
    buckets) plus a broadcast cumulative bucket offset — no global
    single-partition window, so the plan survives 100 TB where a
    global ORDER BY window would serialize on one task."""
    t = load_tables(spark, sf_dir)
    m = t.documents.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        (F.col("doc_id") / PACK_BUCKET).cast("long").alias("bucket"),
    )
    # pass 1: running sum within each bucket (parallel across buckets)
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = m.withColumn("cum_in", F.sum("n_tok").over(w_in))
    # pass 2: per-bucket totals → cumulative offset of each bucket
    # (tiny: one row per bucket; the only serial window runs over it)
    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = (
        m.groupBy("bucket")
        .agg(F.sum("n_tok").alias("btot"))
        .select(
            "bucket",
            F.coalesce(F.sum("btot").over(w_off), F.lit(0)).alias("off"),
        )
    )
    c = within.join(F.broadcast(offsets), "bucket").select(
        "doc_id", "n_tok", (F.col("cum_in") + F.col("off")).alias("cum")
    )
    shard = F.floor((F.col("cum") - F.col("n_tok")) / PACK_BUDGET).cast("long")
    return (
        c.select(shard.alias("shard"), "n_tok", "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ------------------------------------------------------------- source mix


@query(
    "q_mix_weights",
    oracle="""
    WITH rated AS (
      SELECT source, doc_id,
             CASE WHEN source IN ('src0', 'src1', 'src2') THEN 1.0
                  WHEN length(source) = 5 THEN 0.5
                  ELSE 0.25 END AS rate,
             (CAST(concat('0x',
                    substr(md5(concat('mix-', CAST(doc_id AS VARCHAR))), 1, 8))
                   AS UBIGINT) + 1) / 4294967297.0 AS u
      FROM documents
    )
    SELECT source, rate,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM rated GROUP BY 1, 2
    """,
)
def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted corpus mixing: each source gets a sampling
    rate (high-quality sources kept at 1.0, the src10–19 tier at 0.5,
    the rest at 0.25) and documents are kept by comparing an
    md5-derived uniform against it — deterministic dataset mixing à
    la The Pile / Dolma weights, auditable per source. The mix hash is
    salted ('mix-') so the decision is independent of
    [[q_train_split]]'s split hash."""
    t = load_tables(spark, sf_dir)
    rate = (
        F.when(F.col("source").isin("src0", "src1", "src2"), 1.0)
        .when(F.length("source") == 5, 0.5)
        .otherwise(0.25)
    )
    hex8 = F.substring(
        F.md5(F.concat(F.lit("mix-"), F.col("doc_id").cast("string"))), 1, 8
    )
    u = (F.conv(hex8, 16, 10).cast("double") + 1) / F.lit(4294967297.0)
    return (
        t.documents.select(
            "source", rate.alias("rate"), (u < rate).alias("kept")
        )
        .groupBy("source", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
    )


# -------------------------------------------------------------- url parse


@query(
    "q_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/docs/', lang, '/',
                    CAST(doc_id AS VARCHAR), '?ref=', source) AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'ref=([^&]+)', 1) AS ref
    FROM u
    """,
)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing for web-corpus provenance (host / path / query
    param). The Spark side uses the dedicated `parse_url` expression
    (the fast JVM path a crawl pipeline would use); the oracle states
    the same extraction as regexes — two implementations, one
    spec."""
    t = load_tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("source"),
    )
    u = t.documents.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )


# ------------------------------------------------------------- domain cap

DOMAIN_CAP = 10


@query(
    "q_domain_cap",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source,
             length(text) AS n_chars_actual,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) - length(replace(text, ' ', '')) AS n_spaces,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t = 'the' OR t = 'a' OR t = 'value')) AS n_stop
      FROM documents
    ),
    s AS (
      SELECT source, doc_id,
             round(0.5::DOUBLE * (n_stop / n_tokens)
                   + 0.5::DOUBLE * (least((n_chars_actual - n_spaces) / n_tokens,
                                          8.0::DOUBLE) / 8.0::DOUBLE), 6)
               AS quality
      FROM m
    )
    SELECT source, doc_id, CAST(rn AS INTEGER) AS rank, quality
    FROM (
      SELECT source, doc_id, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rn
      FROM s
    ) WHERE rn <= {DOMAIN_CAP}
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (RefinedWeb/CCNet-style): keep at
    most DOMAIN_CAP docs per source, ranked by [[q_quality_score]]'s
    quality metric (identical expression tree → identical doubles),
    doc_id tie-break. Prevents any one crawl domain from dominating
    the training mix — the deterministic quota counterpart of
    [[q_mix_weights]]'s rate sampling. Scale: one window partitioned
    by source; Spark's WindowGroupLimit pushes the rank<=K filter
    map-side, so each partition ships at most K rows per source into
    the shuffle — a hot domain with 10^8 pages still contributes K
    rows per input partition, not 10^8 (pinned in
    tests/test_plan_shapes.py)."""
    t = load_tables(spark, sf_dir)
    n_chars_actual = F.length("text")
    n_tokens = F.size(F.split(F.col("text"), " "))
    n_spaces = n_chars_actual - F.length(F.regexp_replace("text", " ", ""))
    n_stop = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), " "),
            lambda tk: tk.isin("the", "a", "value"),
        )
    )
    avg_token_len = (n_chars_actual - n_spaces) / n_tokens
    quality = F.round(
        F.lit(0.5) * (n_stop / n_tokens)
        + F.lit(0.5) * (F.least(avg_token_len, F.lit(8.0)) / F.lit(8.0)),
        6,
    )
    s = t.documents.select("source", "doc_id", quality.alias("quality"))
    w = Window.partitionBy("source").orderBy(F.desc("quality"), "doc_id")
    return (
        s.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= DOMAIN_CAP)
        .select("source", "doc_id", "rank", "quality")
    )


# ------------------------------------------------------------- pii redact

_EMAIL_RE = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{4}"


@query(
    "q_pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             concat(substr(text, 1, 40), ' contact ', source,
                    '@corp.example.com or 555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS body
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones
    FROM synth
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails and phone-shaped strings are
    replaced with typed placeholders and counted per document — the
    compliance scrub every published training set runs. (The corpus
    has no real PII, so the fixture synthesizes a contact line per
    document from its own attributes; the redaction expressions are
    the real operator.) Scan-local regex map work — zero shuffle at
    any scale."""
    t = load_tables(spark, sf_dir)
    body = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact "),
        F.col("source"),
        F.lit("@corp.example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    s = t.documents.select("doc_id", body.alias("body"))
    return s.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("body", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        # Python-API patterns, NOT f-string-interpolated F.expr SQL:
        # the SQL string-literal parser consumes backslashes, so an
        # interpolated '\\.' silently became an any-char '.' and the
        # count pattern diverged from the redaction pattern and the
        # oracle (review r6, confirmed by repro)
        F.size(F.regexp_extract_all("body", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("body", F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
    )


# -------------------------------------------- exact-oracle MinHash sigs

# (a, b) parameters of 4 universal-hash functions over the Karp-Rabin
# token fingerprint, mod the Mersenne prime 2^31-1. a*fp < 2^26 * 2^31
# stays well inside int64.
_MH_PARAMS = [(1299721, 7), (15485863, 11), (32452843, 13), (49979687, 17)]
_MH_P = 2147483647

_FP_SPARK = (
    "aggregate(transform(split({w}, ''), c -> CAST(ascii(c) AS BIGINT)), "
    "CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % 2147483647)"
)
_FP_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({w}, ''), "
    "c -> CAST(ascii(c) AS BIGINT))), "
    "(acc, c) -> (acc * 31 + c) % 2147483647)"
)

# Fingerprint every token of a `toks` array ONCE into an `fps` array.
# The per-character fold is the expensive part of the MinHash recipe;
# signature columns derive from `fps` as cheap affine array_mins so the
# fold appears exactly once per query plan instead of once per hash
# function (r11 verdict: the 4x-inlined fold quadrupled per-char work
# AND blew the whole-stage-codegen unit up to a ~6 s compile).
_FPS_SPARK = f"transform(toks, w -> {_FP_SPARK.format(w='w')})"


def _fps_col():
    """`fps` = per-token Karp-Rabin fingerprints of `toks`, computed in
    its own projection stage. Catalyst's CollapseProject keeps the
    stage separate (a non-cheap alias referenced 4x is never inlined),
    so codegen folds each character exactly once."""
    return F.expr(_FPS_SPARK).alias("fps")


def _mh_cols_from_fps() -> list:
    """mh0..mh3 as cheap seeded affine `array_min`s over a precomputed
    `fps` column — bit-identical to hashing inside the fold (integer
    arithmetic is associative over the same fp values)."""
    return [
        F.expr(f"array_min(transform(fps, f -> ({a} * f + {b}) % {_MH_P}))")
        .alias(f"mh{i}")
        for i, (a, b) in enumerate(_MH_PARAMS)
    ]


def mh_sig_cte_sql(with_toks: bool = False) -> str:
    """The portable MinHash signature table as a DuckDB CTE —
    ``sig(doc_id[, toks], mh0..mh3)`` over lowercased word-trigram
    shingles of ``documents``. Shared by every oracle that recomputes
    signatures from raw text (estimator audit, from-layout integrity,
    incremental ingest) so the hash recipe lives in exactly ONE place
    per engine; `dedup_ext._mh_sig_cols` is the Spark twin."""
    fp = _FP_DUCK.format(w="w")
    sig_cols = ", ".join(
        f"list_min(list_transform(toks, w -> ({a} * ({fp}) + {b}) % {_MH_P}))"
        f" AS mh{i}"
        for i, (a, b) in enumerate(_MH_PARAMS)
    )
    toks = "toks, " if with_toks else ""
    return f"""sig AS (
      SELECT doc_id, {toks}{sig_cols}
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS toks
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
              FROM documents)
        WHERE len(tk) >= 3
      )
    )"""


def _mh_oracle() -> str:
    cols = ", ".join(
        "list_min(list_transform(toks, w -> "
        f"({a} * {_FP_DUCK.format(w='w')} + {b}) % {_MH_P})) AS mh{i}"
        for i, (a, b) in enumerate(_MH_PARAMS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id,
             list_distinct(string_split(lower(text), ' ')) AS toks
      FROM documents
    )
    SELECT doc_id, {cols} FROM tok
    """


@query("q_minhash_sig", oracle=_mh_oracle())
def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures with EXACT cross-engine parity: instead of
    an engine-private hash (Spark's xxhash64 vs DuckDB's hash never
    agree), tokens are fingerprinted by the portable Karp-Rabin fold
    of [[q_fingerprint]] and passed through 4 universal hash functions
    mod 2^31-1 — pure integer arithmetic, bit-identical anywhere. The
    signature is computed in two scan-local projections per row
    (array_distinct → one fingerprint fold into `fps` → 4 cheap affine
    array_mins): zero shuffle, zero Python — the map stage that
    [[q_dedup_minhash]]'s banding join consumes at scale. The fold is
    factored out (r12) so codegen emits it once, not once per hash
    function: same values, ~4x less per-char work, ~4x smaller codegen
    unit (the r11 driver run paid a 6.4 s first-compile on the inlined
    form)."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("toks"),
    )
    return toks.select("doc_id", _fps_col()).select(
        "doc_id", *_mh_cols_from_fps()
    )


# ---------------------------------------------------- dataset card


@query(
    "q_dataset_card",
    oracle=f"""
    WITH m AS (
      SELECT source, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             (length(text) - (length(text) - length(replace(text, ' ', ''))))
               / len(string_split(text, ' ')) AS avg_token_len,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t = 'the' OR t = 'a' OR t = 'value'))
               / len(string_split(text, ' ')) AS stop_ratio
      FROM documents
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n_tokens) AS DOUBLE) / count(*), 6) AS avg_doc_tokens,
           round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
           round(quantile_cont(n_tokens, 0.9), 6) AS p90_tokens,
           round(count(*) FILTER (WHERE
                   n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}
                   AND stop_ratio >= {MIN_STOP_RATIO}
                   AND avg_token_len >= {MIN_AVG_TOKLEN}
                   AND avg_token_len <= {MAX_AVG_TOKLEN})
                 / CAST(count(*) AS DOUBLE), 6) AS gate_pass_rate
    FROM m GROUP BY source, lang
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the per-(source, lang) summary table every
    published training corpus ships — document and token totals,
    token-length distribution (interpolated p50/p90, the
    [[q_quantiles]] convention), and the fraction passing
    [[q_corpus_gate]]'s quality rules. One scan-local feature
    projection followed by a single hash aggregate keyed by
    (source, lang): at 100 TB this is the cheapest possible shape —
    no joins, no windows, partial aggregation map-side, and the
    output is catalog-sized."""
    t = load_tables(spark, sf_dir)
    cols, ok = gate_features("source", "lang")
    m = t.documents.select(*cols)
    return m.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_doc_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 6).alias("p90_tokens"),
        F.round(
            F.count_if(ok) / F.count(F.lit(1)).cast("double"), 6
        ).alias("gate_pass_rate"),
    )


# --------------------------------------------------- URL canonical dedup


@query(
    "q_url_dedup",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('HTTPS://WWW.Example.COM/docs/page-',
                    CAST(doc_id % 97 AS VARCHAR),
                    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,
                    '?utm_source=feed&utm_campaign=x&id=',
                    CAST(doc_id % 97 AS VARCHAR),
                    CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END) AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^[a-zA-Z]+://([^/]+)', 1)) AS host,
             regexp_replace(
               regexp_extract(url, '^[a-zA-Z]+://[^/]+([^?#]*)', 1),
               '/$', '') AS path,
             list_filter(
               string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
               p -> p != '' AND p NOT LIKE 'utm\\_%' ESCAPE '\\') AS params
      FROM u
    ),
    canon AS (
      SELECT doc_id, url,
             concat(host, path,
                    CASE WHEN len(params) > 0
                         THEN concat('?', array_to_string(params, '&'))
                         ELSE '' END) AS canonical
      FROM parts
    ),
    ranked AS (
      SELECT doc_id, url, canonical,
             row_number() OVER (PARTITION BY canonical ORDER BY doc_id) AS rn,
             CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT) AS n_dups
      FROM canon
    )
    SELECT doc_id, url, canonical, (rn = 1) AS keep, n_dups
    FROM ranked
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style URL dedup: canonicalize (lowercase host, strip the
    fragment, drop utm_* tracking params, drop the then-empty query,
    drop the trailing slash) and keep the first doc_id per canonical
    URL. (The corpus ships no URLs, so the fixture synthesizes
    messy-but-deterministic ones from doc ids — the same page appears
    with different case, tracking params, trailing slash, and
    fragment, and only canonicalization reunites the variants.) Param filtering is a
    split→filter→rejoin over higher-order functions rather than
    chained regex_replace — engines disagree on replace-all vs
    replace-first semantics, array ops don't. Scan-local map work
    plus ONE window keyed by canonical URL — [[q_chunk_dedup]]'s
    content-keyed keep-first shape, same balanced-exchange argument
    at 100 TB."""
    t = load_tables(spark, sf_dir)
    url = F.concat(
        F.lit("HTTPS://WWW.Example.COM/docs/page-"),
        (F.col("doc_id") % 97).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, "/").otherwise(""),
        F.lit("?utm_source=feed&utm_campaign=x&id="),
        (F.col("doc_id") % 97).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, "#frag").otherwise(""),
    )
    u = t.documents.select("doc_id", url.alias("url"))
    host = F.lower(F.regexp_extract("url", r"^[a-zA-Z]+://([^/]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[a-zA-Z]+://[^/]+([^?#]*)", 1), r"/$", ""
    )
    params = F.filter(
        F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    canonical = F.concat(
        host,
        path,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(""),
    )
    canon = u.select("doc_id", "url", canonical.alias("canonical"))
    w = Window.partitionBy("canonical").orderBy("doc_id")
    return canon.select(
        "doc_id",
        "url",
        "canonical",
        (F.row_number().over(w) == 1).alias("keep"),
        F.count(F.lit(1)).over(Window.partitionBy("canonical")).alias("n_dups"),
    )


# ------------------------------------------ preference-pair mining

DPO_MARGIN = 0.01  # minimum chosen-vs-rejected score gap


@query(
    "q_dpo_pairs",
    oracle=f"""
    WITH scored AS (
      SELECT source, lang, doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE)
               / CAST(n_chars AS DOUBLE) AS score
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY source, lang
                                ORDER BY score DESC, doc_id) AS rn_top,
             row_number() OVER (PARTITION BY source, lang
                                ORDER BY score ASC, doc_id) AS rn_bot
      FROM scored
    )
    SELECT c.source, c.lang,
           c.doc_id AS chosen_doc, r.doc_id AS rejected_doc,
           round(c.score, 6) AS chosen_score,
           round(r.score, 6) AS rejected_score,
           round(c.score - r.score, 6) AS margin
    FROM (SELECT * FROM ranked WHERE rn_top = 1) c
    JOIN (SELECT * FROM ranked WHERE rn_bot = 1) r
      ON c.source = r.source AND c.lang = r.lang
    WHERE c.doc_id <> r.doc_id AND c.score - r.score >= {DPO_MARGIN!r}
    """,
)
def q_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for DPO/RLHF fine-tuning — the
    step that turns a scored candidate pool into (chosen, rejected)
    training pairs: within each prompt group (here (source, lang) as
    the grouping proxy; in production, responses per prompt), take
    the best- and worst-scoring candidates under a reward proxy
    (word-density here, a reward model's logit in production), keep
    the pair only when the score gap clears a margin ({DPO_MARGIN} —
    pairs the reward model can't separate teach nothing and dilute
    the DPO loss, per the InstructGPT comparison-data recipe).

    Both extremes come from ONE ranking pass: two row_number windows
    over the same (source, lang) partition share a single exchange
    (Catalyst plans one shuffle; the opposite sort orders reuse it),
    deterministic doc_id tie-breaks keep both engines on the same
    row, and the self-join back is |groups|-row against |groups|-row.
    At 100 TB this is the standard top-1/bottom-1-per-key shape:
    WindowGroupLimit forwards O(1) rows per group per task, so the
    pair table never materializes the candidate pool."""
    t = load_tables(spark, sf_dir)
    scored = t.documents.where(F.col("n_chars") > 0).select(
        "source", "lang", "doc_id",
        (
            F.size(F.split(F.col("text"), " ")).cast("double")
            / F.col("n_chars").cast("double")
        ).alias("score"),
    )
    w_top = Window.partitionBy("source", "lang").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    w_bot = Window.partitionBy("source", "lang").orderBy(
        F.col("score").asc(), F.col("doc_id")
    )
    ranked = scored.withColumn(
        "rn_top", F.row_number().over(w_top)
    ).withColumn("rn_bot", F.row_number().over(w_bot))
    c = ranked.where(F.col("rn_top") == 1).select(
        "source", "lang",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("cs"),
    )
    r = ranked.where(F.col("rn_bot") == 1).select(
        "source", "lang",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rs"),
    )
    return (
        c.join(r, ["source", "lang"])
        .where(
            (F.col("chosen_doc") != F.col("rejected_doc"))
            & (F.col("cs") - F.col("rs") >= DPO_MARGIN)
        )
        .select(
            "source", "lang", "chosen_doc", "rejected_doc",
            F.round("cs", 6).alias("chosen_score"),
            F.round("rs", 6).alias("rejected_score"),
            F.round(F.col("cs") - F.col("rs"), 6).alias("margin"),
        )
    )


# ------------------------------- pretraining target transformations

# T5-style span corruption layout: tokens come in blocks of
# _SC_SPAN; every _SC_EVERY-th block is masked and replaced by one
# <extra_id_k> sentinel in the input, with the masked content
# re-emitted after the same sentinel in the target. Deterministic
# (position-derived, no RNG), so both engines compute it closed-form.
_SC_SPAN = 3
_SC_EVERY = 5


@query(
    "q_span_corrupt",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE n_chars >= 1
    )
    SELECT doc_id,
           array_to_string(list_filter(list_transform(range(0, len(tk)),
             i -> CASE
               WHEN (i // {_SC_SPAN}) % {_SC_EVERY} = 0
                    AND i % {_SC_SPAN} = 0
                 THEN '<extra_id_' ||
                      CAST(i // {_SC_SPAN * _SC_EVERY} AS VARCHAR) || '>'
               WHEN (i // {_SC_SPAN}) % {_SC_EVERY} = 0 THEN NULL
               ELSE tk[i + 1] END),
             x -> x IS NOT NULL), ' ') AS input_text,
           array_to_string(list_filter(list_transform(range(0, len(tk)),
             i -> CASE
               WHEN (i // {_SC_SPAN}) % {_SC_EVERY} = 0
                    AND i % {_SC_SPAN} = 0
                 THEN '<extra_id_' ||
                      CAST(i // {_SC_SPAN * _SC_EVERY} AS VARCHAR) ||
                      '> ' || tk[i + 1]
               WHEN (i // {_SC_SPAN}) % {_SC_EVERY} = 0 THEN tk[i + 1]
               ELSE NULL END),
             x -> x IS NOT NULL), ' ') AS target_text,
           CAST((len(tk) // {_SC_SPAN * _SC_EVERY}) * {_SC_SPAN}
                + least(len(tk) % {_SC_SPAN * _SC_EVERY}, {_SC_SPAN})
                AS BIGINT) AS n_masked
    FROM t
    """,
)
def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption — the denoising-pretraining target
    transform: every {_SC_EVERY}-th {_SC_SPAN}-token block is masked,
    the input keeps one <extra_id_k> sentinel per masked span, and
    the target re-emits each sentinel followed by the span it hid.
    Mask positions are position-derived (block index arithmetic, no
    RNG), so the pair is reproducible and the oracle recomputes it
    exactly. One scan-local expression per document: the token array
    is bound once (lambda-binding rule) and both sides fold over the
    same sequence — no shuffle, no Python; at 100 TB this is a
    partition-parallel map over the corpus, the same shape a
    tokenizer-sharding job runs (no repartition: scan splits provide
    the parallelism; the spread shuffle lost the A/B at sf0.1 too,
    0.34 vs 0.28 s)."""
    t = load_tables(spark, sf_dir)
    blk = f"(i DIV {_SC_SPAN}) % {_SC_EVERY} = 0"
    sent = f"'<extra_id_' || CAST(i DIV {_SC_SPAN * _SC_EVERY} AS STRING) || '>'"
    body = (
        "element_at(transform(array(split(text, ' ')), tk -> named_struct("
        "  'inp', array_join(filter(transform(sequence(0, size(tk) - 1),"
        f"    i -> CASE WHEN {blk} AND i % {_SC_SPAN} = 0 THEN {sent}"
        f"              WHEN {blk} THEN NULL"
        "               ELSE element_at(tk, i + 1) END),"
        "    x -> x IS NOT NULL), ' '),"
        "  'tgt', array_join(filter(transform(sequence(0, size(tk) - 1),"
        f"    i -> CASE WHEN {blk} AND i % {_SC_SPAN} = 0"
        f"                THEN {sent} || ' ' || element_at(tk, i + 1)"
        f"              WHEN {blk} THEN element_at(tk, i + 1)"
        "               ELSE NULL END),"
        "    x -> x IS NOT NULL), ' '),"
        f"  'nm', CAST((size(tk) DIV {_SC_SPAN * _SC_EVERY}) * {_SC_SPAN}"
        f"             + least(size(tk) % {_SC_SPAN * _SC_EVERY},"
        f"                     {_SC_SPAN}) AS BIGINT)"
        ")), 1)"
    )
    return (
        t.documents.where(F.col("n_chars") >= 1)
        .select("doc_id", F.expr(body).alias("s"))
        .select(
            "doc_id",
            F.col("s.inp").alias("input_text"),
            F.col("s.tgt").alias("target_text"),
            F.col("s.nm").alias("n_masked"),
        )
    )


# FIM split-point multipliers (primes, doc_id-derived; products stay
# far inside int64 at warehouse-scale ids: 1e11 · 104729 < 2^54)
_FIM_A = 7919
_FIM_B = 104729


@query(
    "q_fim_transform",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text, n_chars,
             greatest(n_chars // 3, 1) AS third
      FROM documents WHERE n_chars >= 3
    ), cut AS (
      SELECT doc_id, text,
             1 + (doc_id * {_FIM_A}) % third AS a,
             2 + (doc_id * {_FIM_A}) % third
               + (doc_id * {_FIM_B}) % third AS b
      FROM s
    )
    SELECT doc_id,
           '<PRE>' || substring(text, 1, CAST(a AS INT))
             || '<SUF>' || substring(text, CAST(b + 1 AS INT))
             || '<MID>' || substring(text, CAST(a + 1 AS INT),
                                     CAST(b - a AS INT)) AS fim_text,
           CAST(a AS BIGINT) AS len_prefix,
           CAST(b - a AS BIGINT) AS len_middle
    FROM cut
    """,
)
def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle reordering (PSM layout) — the infilling
    pretraining transform: each document splits at two
    doc_id-derived character offsets into prefix/middle/suffix and is
    re-emitted as <PRE>prefix<SUF>suffix<MID>middle, teaching a
    causal model to infill. Cut points are affine in doc_id (no RNG;
    both cuts land in the first two thirds so every part is
    non-empty for n ≥ 3), so the oracle reproduces the exact string.
    Pure projection over the scan — zero exchanges at any scale."""
    t = load_tables(spark, sf_dir)
    third = f"greatest(n_chars DIV 3, CAST(1 AS BIGINT))"
    a = f"(1 + (doc_id * {_FIM_A}) % {third})"
    b = f"(2 + (doc_id * {_FIM_A}) % {third} + (doc_id * {_FIM_B}) % {third})"
    return (
        t.documents.where(F.col("n_chars") >= 3)
        .select(
            "doc_id",
            F.expr(
                f"'<PRE>' || substring(text, 1, CAST({a} AS INT))"
                f" || '<SUF>' || substring(text, CAST({b} + 1 AS INT))"
                f" || '<MID>' || substring(text, CAST({a} + 1 AS INT),"
                f"                         CAST({b} - {a} AS INT))"
            ).alias("fim_text"),
            F.expr(f"CAST({a} AS BIGINT)").alias("len_prefix"),
            F.expr(f"CAST({b} - {a} AS BIGINT)").alias("len_middle"),
        )
    )
