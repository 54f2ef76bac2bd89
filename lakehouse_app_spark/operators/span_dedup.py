"""Substring-granular dedup metrics and positional fingerprinting.

Extends the dedup family ([[q_neardup_exact]] → [[q_dedup_minhash]] →
[[q_chunk_dedup]]) with the two remaining substring-level tools a
pretraining pipeline runs (seeded by the reference's pair-identity
dedup of retrieved sources, `app/app.py:111,117-124`):

- :func:`q_dedup_spans` — the ExactSubstr coverage metric of Lee et
  al. 2022 ("Deduplicating Training Data Makes Language Models
  Better"): OVERLAPPING k-token windows (stride 1, vs
  [[q_chunk_dedup]]'s disjoint chunks), any window shared verbatim by
  ≥2 docs marks its span duplicated, overlapping spans are merged,
  and each doc reports the fraction of its tokens covered by
  cross-doc duplicated text. Lee et al. mine the spans with a suffix
  array over the concatenated corpus — a single-machine data
  structure; the distributed equivalent is this window→group→merge
  plan (every stage a hash-partitioned agg / window over doc_id).
- :func:`q_winnow_fingerprint` — winnowing document fingerprints
  (Schleimer/Wilkerson/Aiken 2003, the MOSS algorithm): k-char-gram
  Karp-Rabin hashes, sliding window of w consecutive grams, keep each
  window's minimum (rightmost on ties). Guarantees any shared run of
  ≥ w+k-1 chars contributes a shared fingerprint, at an expected
  2/(w+1) selection density — the ingest-side artifact that makes
  substring-dedup incremental (new docs compare fingerprint sets, not
  text).

Scale: gram generation is scan-local projection (inline/transform —
no Python, no pre-shuffle text duplication); the only shuffles are a
hash-agg on the gram key and per-doc window functions whose partition
is one document. At 100 TB the gram join key would be xxhash64(gram)
with verify-on-collision instead of the raw string, and the
Karp-Rabin per-gram fold would be the O(1)-per-position rolling
update at ingest; both substitutions are noted inline and change no
semantics. The oracle-portable forms here group on the gram string /
re-fold per gram so DuckDB reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_app_spark.operators.dedup import spread
from lakehouse_app_spark.registry import query
from lakehouse_app_spark.runtime_cache import scoped_persist
from lakehouse_app_spark.sources.tables import load_tables

SPAN_TOKENS = 8  # k: tokens per window (Lee et al. use 50 BPE tokens)
WINNOW_K = 5  # chars per gram
WINNOW_W = 4  # grams per winnowing window
# injective (fp, pos) encoding: fp*1024 + (1023-pos). Valid only for
# docs ≤ 1024 chars — enforced at runtime in q_winnow_fingerprint via
# a raise_error guard on the doc length (the corpus is external, so
# the invariant cannot be assumed); min() then prefers the RIGHTMOST
# position among equal fps, the MOSS tie rule.
_POS_BASE = 1024


def token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, gram): every overlapping SPAN_TOKENS-token
    window of every doc, stride 1. Scan-local (inline over transform
    — the gram text is materialized once, in the projection, never by
    an exchange)."""
    t = load_tables(spark, sf_dir)
    return (
        spread(t.documents)
        .select("doc_id", F.split("text", " ").alias("tk"))
        .where(F.size("tk") >= SPAN_TOKENS)
        .select(
            "doc_id",
            F.expr(
                f"inline(transform(sequence(0, size(tk) - {SPAN_TOKENS}), "
                f"i -> struct(i AS pos, "
                f"array_join(slice(tk, i + 1, {SPAN_TOKENS}), ' ') AS gram)))"
            ),
        )
    )


@query(
    "q_dedup_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    grams AS (
      SELECT doc_id, i AS pos,
             array_to_string(list_slice(tk, i + 1, i + {SPAN_TOKENS}), ' ')
               AS gram
      FROM toks,
           LATERAL (SELECT unnest(range(0, len(tk) - {SPAN_TOKENS} + 1)) AS i)
      WHERE len(tk) >= {SPAN_TOKENS}
    ),
    shared AS (
      SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    ),
    spans AS (
      SELECT g.doc_id, g.pos AS s, g.pos + {SPAN_TOKENS} AS e
      FROM grams g JOIN shared USING (gram)
    ),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS ni
      FROM spans
    ),
    isl AS (
      SELECT doc_id, s, e,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY s
                           ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    cov AS (
      SELECT doc_id, island, max(e) - min(s) AS covered
      FROM isl GROUP BY doc_id, island
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS dup_tokens
      FROM cov GROUP BY doc_id
    )
    SELECT a.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens, a.dup_tokens,
           round(a.dup_tokens / len(t.tk), 6) AS dup_frac
    FROM agg a JOIN toks t USING (doc_id)
    """,
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicated-span coverage (Lee et al. 2022 ExactSubstr).

    Overlapping SPAN_TOKENS-token windows → windows verbatim-shared
    by ≥2 docs → per-doc interval merge (gaps-and-islands: a span
    starting past the running max end opens a new island) → covered
    tokens / total tokens. Docs with zero duplicated coverage are
    omitted (the interesting output is the dup report, not the clean
    majority). Distinct from [[q_chunk_dedup]]: stride 1 catches
    duplicated text at ANY alignment, and the coverage fraction is the
    Lee-et-al. removal criterion. At 100 TB the gram group key becomes
    xxhash64(gram) (verify-on-collision); the merge stays a per-doc
    window — partition = doc_id, frame size = spans per doc.
    """
    grams = token_spans(spark, sf_dir).transform(scoped_persist)
    # "shared by >=2 docs" as min(doc)!=max(doc): same predicate as
    # count_distinct>=2 but the partial agg ships two longs per gram
    # instead of per-key doc sets. Shared grams are a sliver of the
    # corpus -> broadcast them into the semi-join.
    shared = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .where(F.col("d0") != F.col("d1"))
        .select("gram")
    )
    spans = grams.join(F.broadcast(shared), "gram", "left_semi").select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + SPAN_TOKENS).alias("e"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.select(
        "doc_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        )
        .otherwise(0)
        .alias("ni"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = flagged.select(
        "doc_id", "s", "e", F.sum("ni").over(w_run).alias("island")
    )
    cov = isl.groupBy("doc_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    agg = cov.groupBy("doc_id").agg(F.sum("covered").alias("dup_tokens"))
    sizes = (
        load_tables(spark, sf_dir)
        .documents.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
        )
    )
    return agg.join(sizes, "doc_id").select(
        "doc_id",
        "n_tokens",
        "dup_tokens",
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_frac"),
    )


_FP_GRAM_SPARK = (
    f"aggregate(transform(split(substring(text, i + 1, {WINNOW_K}), ''), "
    "c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), "
    "(acc, c) -> (acc * 31 + c) % 2147483647)"
)
_FP_GRAM_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_transform(string_split(substr(text, i + 1, {WINNOW_K}), ''), "
    "c -> CAST(ascii(c) AS BIGINT))), "
    "(acc, c) -> (acc * 31 + c) % 2147483647)"
)


@query(
    "q_winnow_fingerprint",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, i AS pos, length(text) AS n_ch,
             {_FP_GRAM_DUCK} AS fp
      FROM documents,
           LATERAL (SELECT unnest(range(0, length(text) - {WINNOW_K} + 1))
                    AS i)
      WHERE length(text) >= {WINNOW_K + WINNOW_W - 1}
    ),
    u AS (
      SELECT doc_id, pos, n_ch,
             fp * {_POS_BASE} + ({_POS_BASE - 1} - pos) AS fpu
      FROM grams
    ),
    wm AS (
      SELECT doc_id, pos, n_ch,
             min(fpu) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {WINNOW_W - 1} FOLLOWING) AS wmin
      FROM u
    ),
    sel AS (
      SELECT DISTINCT doc_id, wmin
      FROM wm WHERE pos <= n_ch - {WINNOW_K + WINNOW_W - 1}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           CAST(sum(wmin // {_POS_BASE}) AS BIGINT) AS fp_sum,
           CAST(min(wmin // {_POS_BASE}) AS BIGINT) AS fp_min,
           CAST(sum({_POS_BASE - 1} - (wmin % {_POS_BASE})) AS BIGINT)
             AS pos_sum
    FROM sel GROUP BY doc_id
    """,
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing positional fingerprints (Schleimer et al. 2003 /
    MOSS), aggregated per doc.

    WINNOW_K-char-gram Karp-Rabin hashes → sliding window of WINNOW_W
    grams → keep each window's minimum, rightmost on ties (ties are
    resolved by the injective fpu = fp*1024 + (1023-pos) encoding, so
    "min fpu" IS "min fp, then max pos", and the selected set is
    exactly the distinct window minima — no per-window argmin join).
    Guarantee: any verbatim overlap of ≥ w+k-1 chars between two docs
    shares ≥1 fingerprint; expected density 2/(w+1). Output is the per-doc
    fingerprint-set summary (count/sum/min + position checksum) —
    1 row/doc, the form a fingerprint index stores.

    Plan (re-planned round 8): the whole pipeline is ONE scan-local
    projection — per-position fpu array → per-window array_min over a
    w-slice → array_distinct → summary folds — with NO exchange
    anywhere. The previous shape exploded every gram to a row and ran
    min() OVER (PARTITION BY doc_id), i.e. shuffled and sorted the
    entire gram stream (~n_chars rows/doc) just to compute a window a
    single task can compute inside the doc (docs are ≤ _POS_BASE
    chars BY INVARIANT — the guard below — so per-doc work is
    bounded); measured 1.26 s → scan-local at sf0.1, and at 100 TB
    the saving is a full corpus-width shuffle+sort. The winnow
    window min is inherently doc-local; only the SUMMARY is global.
    """
    t = load_tables(spark, sf_dir)
    # Enforce the (fp, pos) encoding invariant AT RUNTIME (review r8):
    # the fpu packing below is injective only while pos < _POS_BASE,
    # i.e. every document is ≤ _POS_BASE chars. The corpus is
    # external, so a longer doc must fail loudly here — silently it
    # would corrupt the min-fp/rightmost-tie ordering while the
    # formula-replicating oracle stayed green. raise_error rides the
    # used n_ch column, so Catalyst cannot prune the check.
    n_ch_checked = F.when(
        F.length("text") > _POS_BASE,
        F.raise_error(
            F.concat(
                F.lit(
                    f"q_winnow_fingerprint: document longer than "
                    f"_POS_BASE={_POS_BASE} chars breaks the (fp,pos) "
                    f"packing; raise _POS_BASE (doc_id="
                ),
                F.col("doc_id").cast("string"),
                F.lit(")"),
            )
        ).cast("int"),
    ).otherwise(F.length("text"))
    # fpu array per doc (position i → fp(i)*B + (B-1-i)), each
    # window's min from a w-slice, distinct minima, summary folds —
    # one generator expression. Each intermediate array is bound as
    # a LAMBDA VARIABLE (transform(array(X), a -> ...)), never a
    # projected column: Catalyst's projection collapse inlines column
    # expressions into every consumer, which turns "compute the fpu
    # array once, slice it per window" into "rebuild the whole array
    # per window" — O(n²·k) per doc, measured as a multi-minute hang
    # at sf0.1. A lambda binding is evaluated exactly once. The
    # window count rides the GUARDED n_ch column, so the length
    # invariant stays load-bearing. inline() emits the struct's
    # fields as columns in one evaluation.
    fpu_arr = (
        f"transform(sequence(0, length(text) - {WINNOW_K}), "
        f"i -> ({_FP_GRAM_SPARK}) * {_POS_BASE} "
        f"+ ({_POS_BASE - 1} - i))"
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
