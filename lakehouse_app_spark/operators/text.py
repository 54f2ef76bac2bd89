"""Text-analysis operators over the document corpus.

Generalizes the reference's document post-processing — truncate +
normalize (R9, `app/app.py:113-115`), regex HTML transforms (R23,
`lakehouse_app_helpers.py:38-53`) — and adds the LLM-training-data
pipeline surface: tokenization/word count, corpus stats, language-ID
heuristic, quality scoring, token counting, and document
fingerprinting (rolling hash).

Everything here is built-in Catalyst expressions (split/explode/
higher-order functions) — no Python in the hot path, so at 100 TB
these run as scan-local map work + one hash-aggregate shuffle max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


def tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")


@query(
    "q_tokenize_wordcount",
    oracle="""
    SELECT w AS word, count(*) AS cnt
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
    GROUP BY w
    """,
)
def q_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + word count (explode is the UDTF-shaped row
    generator). Map-side partial counts keep the shuffle tiny —
    it carries one row per distinct word per task."""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .count()
        .withColumnRenamed("count", "cnt")
    )


@query(
    "q_text_stats",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           round(avg(length(text)), 6) AS avg_len,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (NS 'text analysis')."""
    t = load_tables(spark, sf_dir)
    return t.documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.length("text")), 6).alias("avg_len"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# Marker tokens per language family. On this synthetic corpus the
# text is a shared vocabulary, so this is a *plumbing* demonstration
# of n-gram/stopword language ID: real deployments swap in real
# stopword lists; the operator shape (token-set scoring, argmax with
# deterministic tie-break) is unchanged.
_LANG_MARKERS = {
    "en": ("the", "a"),
    "query_speak": ("query", "table", "scan"),
    "stream_speak": ("stream", "window", "batch"),
}


@query(
    "q_lang_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t = 'the' OR t = 'a')) AS s_en,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t = 'query' OR t = 'table' OR t = 'scan')) AS s_query,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t = 'stream' OR t = 'window' OR t = 'batch')) AS s_stream
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN s_en >= s_query AND s_en >= s_stream THEN 'en'
                WHEN s_query >= s_stream THEN 'query_speak'
                ELSE 'stream_speak' END AS predicted_lang,
           s_en, s_query, s_stream
    FROM scored
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-count language ID heuristic (argmax with fixed
    tie-break order — deterministic)."""
    t = load_tables(spark, sf_dir)

    def marker_score(words) -> Column:
        return F.size(F.filter(tokens(), lambda tk: tk.isin(*words)))

    scored = t.documents.select(
        "doc_id",
        marker_score(_LANG_MARKERS["en"]).alias("s_en"),
        marker_score(_LANG_MARKERS["query_speak"]).alias("s_query"),
        marker_score(_LANG_MARKERS["stream_speak"]).alias("s_stream"),
    )
    return scored.select(
        "doc_id",
        F.when(
            (F.col("s_en") >= F.col("s_query")) & (F.col("s_en") >= F.col("s_stream")),
            "en",
        )
        .when(F.col("s_query") >= F.col("s_stream"), "query_speak")
        .otherwise("stream_speak")
        .alias("predicted_lang"),
        "s_en",
        "s_query",
        "s_stream",
    )


@query(
    "q_quality_score",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars_actual,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) - length(replace(text, ' ', '')) AS n_spaces,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t = 'the' OR t = 'a' OR t = 'value')) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens, n_chars_actual,
           round((n_chars_actual - n_spaces) / n_tokens, 6) AS avg_token_len,
           round(n_stop / n_tokens, 6) AS stop_ratio,
           round(0.5::DOUBLE * (n_stop / n_tokens)
                 + 0.5::DOUBLE * (least((n_chars_actual - n_spaces) / n_tokens,
                                        8.0::DOUBLE) / 8.0::DOUBLE), 6) AS quality
    FROM m
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length / whitespace / stopword-ratio
    features combined into one score (NS 'text analysis'). The score
    formula is the same expression tree on both engines, so doubles
    match bit-for-bit before rounding."""
    t = load_tables(spark, sf_dir)
    n_chars_actual = F.length("text")
    n_tokens = F.size(F.split(F.col("text"), " "))
    n_spaces = n_chars_actual - F.length(F.regexp_replace("text", " ", ""))
    n_stop = F.size(F.filter(tokens(), lambda tk: tk.isin("the", "a", "value")))
    m = t.documents.select(
        "doc_id",
        n_chars_actual.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        n_spaces.alias("n_spaces"),
        n_stop.alias("n_stop"),
    )
    avg_token_len = (F.col("n_chars_actual") - F.col("n_spaces")) / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    quality = F.lit(0.5) * stop_ratio + F.lit(0.5) * (
        F.least(avg_token_len, F.lit(8.0)) / F.lit(8.0)
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "n_chars_actual",
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
             AS n_bpe_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex lexer
    (letters / digits / punctuation runs)."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        F.size(
            F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ).alias("n_bpe_tokens"),
    )


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
             (acc, c) -> (acc * 31 + c) % 2147483647) AS fp
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp-Rabin-style rolling-hash document fingerprint: a
    sequential modular fold over the character codes. Both engines
    fold left-to-right over identical integers → exact parity."""
    t = load_tables(spark, sf_dir)
    fp = F.expr(
        "aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % 2147483647)"
    )
    return t.documents.select("doc_id", fp.alias("fp"))


@query(
    "q_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT d.doc_id, d.lang, t.w AS term, count(*) AS tf
      FROM documents d,
           LATERAL (SELECT unnest(string_split(lower(d.text), ' ')) AS w) t
      GROUP BY 1, 2, 3
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.lang, tf.term,
             round(SUM(tf.tf) * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term), n
      GROUP BY tf.lang, tf.term, n.n_docs, df.df
    )
    SELECT lang, term, tfidf, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT lang, term, tfidf,
             row_number() OVER (PARTITION BY lang
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring with top-3 terms per language: term frequency ×
    ln(N/df), summed per (lang, term), ranked per group.

    One hash aggregate (tf) whose term-partitioned COUNT window is
    the df table — the inverted-index statistics pass of corpus
    analytics in a single derivation of the tokenized subtree. The log
    argument is an exact integer ratio on both engines, so rounded
    scores match; ranking orders by the rounded score (§5.3 rule 2).
    N (corpus size) folds in as a broadcast single-row aggregate —
    one plan, no driver-side action.
    """
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    tf = (
        t.documents.select(
            "doc_id", "lang", F.explode(tokens()).alias("term")
        )
        .groupBy("doc_id", "lang", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf is unique per (doc_id, term) after its groupBy, so document
    # frequency is COUNT(*) over a term-partitioned window on tf
    # itself — the old groupBy("term").countDistinct re-derived the
    # scan→tokenize→aggregate subtree a second time because tf feeds
    # two consumers (guide §7.2 duplicated subtrees, r14
    # optimization: 3 corpus scans → 2, the second being the
    # count-only n_docs pass over pruned pages)
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term")).alias("df")
    n_docs = t.documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.select("doc_id", "lang", "term", "tf", df_w)
        .crossJoin(F.broadcast(n_docs))
        .groupBy("lang", "term", "n_docs", "df")
        .agg(
            # ln(N/df) is constant per group — hoisted outside the
            # sum so the aggregation is an exact integer Σtf and the
            # score is one double multiply: order-insensitive by
            # construction, no decimal cast needed (review r6)
            F.round(
                F.sum("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf")
        )
        .drop("n_docs", "df")
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("lang", "term", "tfidf", "rank")
    )


@query(
    "q_truncate_render",
    oracle="""
    SELECT doc_id,
           substr(replace(text, chr(10), ''), 1, 50) || '...' AS snippet
    FROM documents
    """,
)
def q_truncate_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact citation-snippet semantics (R9,
    `app/app.py:113-115`): strip newlines, first 50 chars, append
    '...'."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.concat(
            F.substring(F.expr("replace(text, '\n', '')"), 1, 50), F.lit("...")
        ).alias("snippet"),
    )


@query(
    "q_regex_transform",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(source, '^(src)([0-9]+)$',
                          '<a href="/apps/\1\2">\1\2</a>') AS source_link,
           regexp_replace(lang, '^(en|fr)$', '<b>\1</b>') AS lang_html
    FROM documents
    """,
)
def q_regex_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's regex linkify/colorize rewrites (R23,
    `lakehouse_app_helpers.py:38-53`) as regexp_replace with
    capture-group refs (Spark `$1` ↔ DuckDB `\\1`)."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.regexp_replace(
            "source", "^(src)([0-9]+)$", '<a href="/apps/$1$2">$1$2</a>'
        ).alias("source_link"),
        F.regexp_replace("lang", "^(en|fr)$", "<b>$1</b>").alias("lang_html"),
    )
