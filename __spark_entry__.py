"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``lakehouse_app_spark/``; this file is the
thin wiring layer.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng

eng.load_all_queries()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Mirrors the reference's core loop (`app/vector_search.py:29-33` +
    `app/app.py:111-124`): top-3 cosine retrieval joined to the
    document corpus, projected to (doc_id, source, snippet, sim).
    """
    eng.ensure_runtime_confs(spark)
    return eng.QUERIES["q_vs_retrieve"](spark, SMOKE_SF_DIR)


# The driver's correctness gate samples the first 50 declared
# queries. Rounds 2-8 drove every registered key green at least
# once; per the round-3 verdict the window ROTATES each round onto
# (a) new keys, (b) changed plans, (c) the keys the driver has
# re-sampled least recently, so the whole surface accumulates FRESH
# driver-green coverage instead of re-checking a fixed showcase.
# Round-12 window: (a) the NEW keys — q_ann_ivf_retrain (one-round
# seeded Lloyd re-train over the stored assignment layout, skew-gated,
# moved-vector report) and q_stream_pruned_join (stream-static fact
# ingest whose per-batch key set prunes the month-partitioned static
# layout at trigger time — DPP on the streaming path); (b) every plan
# this round touched — the fold-once Karp-Rabin refactor's consumers
# (q_minhash_sig/audit, q_dedup_from_layout/incremental/minhash/
# simhash, q_stream_incremental_dedup, q_ngram_novelty,
# q_cms_heavy_hitters — bit-identical recipe, new 2-projection plan),
# q_stream_ivf_append (staging retirement), q_join_dpp +
# q_compact_roundtrip (corpus_scalar lock path), q_stream_state_timers
# (joined TWS_WATCH, timer-floor instrument); (c) the LEAST-recently-
# driver-sampled keys: the r06 alphabet continuation, oldest first.
_SHOWCASE = [
    # (a) this round's NEW keys (r12)
    "q_ann_ivf_retrain", "q_stream_pruned_join",
    # (b) this round's changed paths: the fold-once MinHash/SimHash/
    # CMS refactor (bit-identical recipe, new plan shape), the
    # fingerprint-keyed staging retirement, the corpus_scalar lock
    "q_minhash_sig", "q_minhash_audit", "q_dedup_from_layout",
    "q_dedup_incremental", "q_dedup_minhash", "q_dedup_simhash",
    "q_stream_incremental_dedup", "q_ngram_novelty",
    "q_cms_heavy_hitters", "q_stream_ivf_append", "q_join_dpp",
    "q_compact_roundtrip", "q_stream_state_timers",
    # (c) least-recently-sampled, oldest first: the remaining r06
    # window (alphabetical continuation from where r11's sample ended)
    "q_join_inner", "q_join_left", "q_join_multiway", "q_join_semi",
    "q_json_extract", "q_lateral_topk", "q_markov_transitions",
    "q_mode_per_group", "q_neardup_lsh", "q_ngram_containment", "q_ohlc",
    "q_pmi_collocations", "q_project", "q_quantiles", "q_recursive_cte",
    "q_regr_trend", "q_rolling_median", "q_sample_stratified",
    "q_scan_count", "q_skew_stats", "q_skyline", "q_sql_interface",
    "q_stream_join", "q_stream_join_outer", "q_variant_json",
    "q_agg_approx", "q_agg_cube", "q_agg_gsets", "q_agg_rollup",
    "q_agg_distinct", "q_agg_pricing", "q_join_anti", "q_join_range",
    "q_join_salted", "q_fuzzy_join",
]

# Keys that would rotate in next if the driver over-samples past 50:
# the oldest-green cycle continues through the r07 window.
_NEXT_UP = [
    "q_join_asof", "q_join_asof_tolerance", "q_join_bucketed",
    "q_window_rank", "q_window_running", "q_window_lag",
    "q_window_sessionize", "q_orderby_limit", "q_set_union",
    "q_set_intersect", "q_set_except", "q_format_docs",
    "q_dedup_sources", "q_truncate_render", "q_map_funcs",
    "q_regex_transform", "q_topk_cosine", "q_vs_retrieve",
    "q_udf_cosine", "q_embed_centroid", "q_neardup_exact",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Membership is filtered through the live registry: an env-gated
    key named in the showcase (q_stream_state_v2 on a host with no
    protobuf source at all) must drop out gracefully, not KeyError
    the whole contract."""
    ordered = {k: eng.QUERIES[k] for k in _SHOWCASE if k in eng.QUERIES}
    ordered.update(
        {k: eng.QUERIES[k] for k in _NEXT_UP if k in eng.QUERIES and k not in ordered}
    )
    ordered.update({k: v for k, v in eng.QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (omitted for
    non-SQL-expressible ops → driver records rows-only checks)."""
    return dict(eng.ORACLES)
