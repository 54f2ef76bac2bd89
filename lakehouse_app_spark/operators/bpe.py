"""BPE vocabulary induction: merge-rule training as DataFrame algebra.

The training-data pipeline's tokenizer half: byte-pair-encoding
learns its vocabulary by repeatedly (1) counting adjacent symbol
pairs across the word-frequency table, (2) picking the most frequent
pair (deterministic tie-break), (3) merging that pair everywhere —
Sennrich et al. 2016, the algorithm behind GPT-2/LLaMA-style
tokenizers. The reference's stack tokenizes behind its model API
(`app/app.py:66-69` — the engine side never sees the vocab); a
corpus engine that PREPARES training data must train the vocab too,
next to [[q_tokenize_wordcount]]'s whitespace/regex counting and
[[q_pack_batches]]'s token budgeting.

Spark-first shape: the word-frequency table is built once (one
explode + hash aggregate — the only corpus-sized work) and each
round is word-table-sized algebra: pair explode → count (map-side
partials) → 1-row argmax broadcast → `replace()` merge projection.
Greedy left-to-right non-overlapping merge semantics come from a
bracket-delimited symbol string — ``[l][r]`` can only match at
symbol boundaries and ``replace`` consumes matches left-to-right, so
``[a][a][a][a]`` merges to ``[aa][aa]`` in one pass with no fold —
which is exactly what lets the DuckDB oracle replay training
bit-for-bit with the same `replace` (SURVEY.md §5.3: same algebra,
same tie-breaks, no engine-private lambdas in the recurrence).

At 100 TB: the word table is vocabulary-sized (millions of rows, not
corpus-sized) after the first aggregate — classic BPE trainers
(SentencePiece, HF tokenizers) make the same reduction — so every
round shuffles kilobyte-scale pair counts; round count is the fixed
vocab budget, not a function of data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.runtime_cache import scoped_persist
from lakehouse_app_spark.sources.tables import load_tables

BPE_MERGES = 3


def _word_table(docs: DataFrame) -> DataFrame:
    """Distinct words with corpus frequency, each rendered as a
    bracket-delimited character-symbol string: 'cat' → '[c][a][t]'.
    Brackets cannot appear inside symbols (words containing them are
    excluded), so '[l][r]' matches only at symbol boundaries."""
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where((F.col("w") != "") & ~F.col("w").rlike(r"[\[\]]"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = F.concat(
        F.lit("["),
        F.array_join(F.split(F.col("w"), ""), "]["),
        F.lit("]"),
    )
    return words.select("w", syms.alias("s"), "freq")


def _pair_counts(wt: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the word table: '[a][b][c]' →
    (a,b), (b,c), weighted by word freq."""
    symbols = F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\]\[")
    pairs = F.expr(
        "transform(sequence(1, size(sy) - 1),"
        " i -> struct(sy[i-1] AS l, sy[i] AS r))"
    )
    return (
        wt.select("freq", symbols.alias("sy"))
        .where(F.size("sy") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("cnt"))
    )


def _bpe_oracle(k: int = BPE_MERGES) -> str:
    """Unrolled training replay (the [[q_pagerank]]/Lloyd convention:
    iterative recurrences unroll rather than recurse, since a
    recursive CTE may reference its own table only once and never
    under an aggregate)."""
    best = """best{i} AS (
      SELECT l, r, cnt FROM (
        SELECT p.l, p.r, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
          SELECT freq,
                 unnest(list_transform(range(1, len(sy)),
                        i -> struct_pack(l := sy[i], r := sy[i+1]))) AS p
          FROM (SELECT freq,
                       string_split(substring(s, 2, length(s) - 2), '][') AS sy
                FROM wt{prev})
          WHERE len(sy) >= 2
        )
        GROUP BY p.l, p.r
      ) ORDER BY cnt DESC, l, r LIMIT 1
    )"""
    merge = """wt{i} AS (
      SELECT replace(s, '[' || b.l || '][' || b.r || ']',
                     '[' || b.l || b.r || ']') AS s, freq
      FROM wt{prev}, best{i} b
    )"""
    parts = [
        """wt0 AS (
      SELECT '[' || array_to_string(string_split(w, ''), '][') || ']' AS s,
             CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE w != '' AND NOT regexp_matches(w, '[\\[\\]]')
      GROUP BY w
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(best.format(i=i, prev=i - 1))
        if i < k:
            parts.append(merge.format(i=i, prev=i - 1))
    rows = "\n    UNION ALL\n    ".join(
        f"SELECT {i} AS step, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, cnt AS pair_count FROM best{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + rows


def _train_bpe(wt: DataFrame, k: int, want_rules: bool):
    """The ONE training loop behind [[q_bpe_merges]] (want_rules=True:
    returns the merge table, skipping the k-th replace that nothing
    would consume — mirroring the oracle's ``if i < k`` structure)
    and [[q_bpe_encode]] (want_rules=False: returns the fully-merged
    word table). A single copy keeps the argmax tie-break and the
    bracket-boundary replace in lockstep between the two queries and
    their oracles (review r6)."""
    out = None
    for step in range(1, k + 1):
        best = scoped_persist(
            _pair_counts(wt)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .select(
                F.lit(step).alias("step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat("l", "r").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
        )
        if want_rules:
            out = best if out is None else out.unionByName(best)
        if step < k or not want_rules:
            rule = best.select(
                F.concat(
                    F.lit("["), "left_sym", F.lit("]["), "right_sym", F.lit("]")
                ).alias("pat"),
                F.concat(F.lit("["), "merged", F.lit("]")).alias("rep"),
            )
            wt = scoped_persist(
                wt.crossJoin(F.broadcast(rule)).select(
                    "w", F.expr("replace(s, pat, rep)").alias("s"), "freq"
                )
            )
    return out, wt


@query("q_bpe_merges", oracle=_bpe_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train {BPE_MERGES} BPE merge rules on the document corpus:
    per round, the globally most frequent adjacent symbol pair
    (count DESC, then (left, right) lexicographic — fully
    deterministic) merges everywhere via the bracket-boundary
    ``replace``. Returns the merge table (step, left, right, merged,
    pair_count) — the artifact a tokenizer ships. The oracle replays
    the identical recurrence as a recursive CTE (the per-step argmax
    is a correlated one-row subquery), so training is exact-checked
    end-to-end, not just spot-audited."""
    t = load_tables(spark, sf_dir)
    wt = scoped_persist(_word_table(t.documents))
    rules, _ = _train_bpe(wt, BPE_MERGES, want_rules=True)
    return rules


def _encode_oracle(k: int = BPE_MERGES) -> str:
    """Oracle for [[q_bpe_encode]]: the training replay of
    :func:`_bpe_oracle` carried one merge further (wt{k} applies the
    k-th rule) plus the per-word symbol count and the document join."""
    best = """best{i} AS (
      SELECT l, r FROM (
        SELECT p.l, p.r, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
          SELECT freq,
                 unnest(list_transform(range(1, len(sy)),
                        i -> struct_pack(l := sy[i], r := sy[i+1]))) AS p
          FROM (SELECT freq,
                       string_split(substring(s, 2, length(s) - 2), '][') AS sy
                FROM wt{prev})
          WHERE len(sy) >= 2
        )
        GROUP BY p.l, p.r
      ) ORDER BY cnt DESC, l, r LIMIT 1
    )"""
    merge = """wt{i} AS (
      SELECT w,
             replace(s, '[' || b.l || '][' || b.r || ']',
                     '[' || b.l || b.r || ']') AS s, freq
      FROM wt{prev}, best{i} b
    )"""
    parts = [
        """wt0 AS (
      SELECT w,
             '[' || array_to_string(string_split(w, ''), '][') || ']' AS s,
             CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE w != '' AND NOT regexp_matches(w, '[\\[\\]]')
      GROUP BY w
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(best.format(i=i, prev=i - 1))
        parts.append(merge.format(i=i, prev=i - 1))
    parts.append(
        f"""vocab AS (
      SELECT w,
             CAST(len(string_split(substring(s, 2, length(s) - 2), ']['))
                  AS BIGINT) AS n_sym
      FROM wt{k}
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + """
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(SUM(v.n_sym) AS BIGINT) AS n_bpe_tokens,
           round(SUM(v.n_sym) / CAST(count(*) AS DOUBLE), 6)
             AS tokens_per_word
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
          FROM documents) d
    JOIN vocab v USING (w)
    GROUP BY d.doc_id
    """
    )


@query("q_bpe_encode", oracle=_encode_oracle())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the {BPE_MERGES}-rule BPE vocabulary
    trained by [[q_bpe_merges]]: per document, whitespace word count,
    BPE token count under the trained merges, and tokens-per-word —
    the fertility statistic that drives vocab-size decisions and the
    token accounting [[q_pack_batches]] budgets with.

    Scale shape: encoding never touches document text with the merge
    rules — the rules apply to the DISTINCT-word table (vocab-sized),
    and documents join the resulting word→token-count map on the
    word key (broadcastable at any corpus size, since vocabularies
    are millions of rows while corpora are billions of documents).
    This is how production tokenizer pipelines amortize BPE: encode
    the vocab once, then the corpus pass is a hash join."""
    t = load_tables(spark, sf_dir)
    wt = scoped_persist(_word_table(t.documents))
    _, wt = _train_bpe(wt, BPE_MERGES, want_rules=False)
    vocab = wt.select(
        "w",
        F.size(
            F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\]\[")
        ).cast("bigint").alias("n_sym"),
    )
    doc_words = t.documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    return (
        doc_words.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_sym") / F.count(F.lit(1)).cast("double"), 6
            ).alias("tokens_per_word"),
        )
    )
