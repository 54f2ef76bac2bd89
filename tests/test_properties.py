"""Property-style invariants (SURVEY.md §5.4.4) on tiny in-memory
fixtures plus the testdata corpus: dedup idempotence, top-k nesting,
union additivity, cosine self-similarity, as-of boundary semantics."""

import pytest
from pyspark.sql import functions as F

from lakehouse_app_spark.operators.joins import asof_join
from lakehouse_app_spark.operators.vectors import (
    as_double_array,
    cosine_sim,
    query_vector,
    topk_cosine,
)
from lakehouse_app_spark.sources.tables import load_tables


def test_dedup_idempotent(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    once = t.documents.select("source", "lang").dropDuplicates()
    twice = once.dropDuplicates()
    assert once.count() == twice.count()
    assert once.subtract(twice).count() == 0


def test_topk_subset_of_topk_plus_one(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    qv = query_vector(t.embeddings, 0)
    k3 = {r["vec_id"] for r in topk_cosine(t.embeddings, qv, 3).collect()}
    k4 = {r["vec_id"] for r in topk_cosine(t.embeddings, qv, 4).collect()}
    assert k3 <= k4


def test_union_all_count_additivity(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    a = t.orders.where(F.col("o_orderstatus") == "F")
    b = t.orders.where(F.col("o_orderstatus") != "F")
    assert a.unionAll(b).count() == t.orders.count()


def test_cosine_self_similarity_is_one(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    emb = as_double_array("embedding")
    sims = t.embeddings.limit(10).select(
        F.round(cosine_sim(emb, emb), 9).alias("s")
    ).collect()
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sims)


@pytest.fixture()
def asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 11), (2, 150, 12), (3, 500, 13)],
        "k long, ts long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 100, 90), (1, 150, 91), (2, 200, 92)],
        "k long, ts long, rid long",
    )
    return left, right


def test_asof_inclusive_boundary_and_nulls(spark, asof_fixture):
    """ts_left >= ts_right (inclusive), latest match wins, no match →
    null — DuckDB ASOF JOIN semantics (SURVEY.md §7.4.3)."""
    left, right = asof_fixture
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", payload_alias="m"
    )
    got = {r["lid"]: r["m"] for r in out.collect()}
    assert got[10] == 100  # equal ts matches (inclusive)
    assert got[11] == 150  # latest prior, not first
    assert got[12] is None  # right exists but only in the future
    assert got[13] is None  # key with no right rows at all


def test_sessionize_gap_boundary(spark):
    import datetime as dt

    from lakehouse_app_spark.operators.windows import sessionize

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(minutes=30)),          # gap == 30m → same session
        (3, 1, t0 + dt.timedelta(minutes=60, seconds=1)),  # gap > 30m → new session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    out = {r["event_id"]: r["session_id"] for r in sessionize(df, 30).collect()}
    assert out[1] == out[2], "exactly-30min gap must NOT split (strict >)"
    assert out[3] == out[2] + 1
