"""Driver-contract smoke tests for __spark_entry__."""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_contract(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 3
    cols = set(df.columns)
    assert {"doc_id", "source", "snippet", "sim"} <= cols
    for r in rows:
        assert r["snippet"].endswith("...")


def test_every_query_has_callable_and_oracle_keys_subset(spark):
    mod = importlib.import_module("__spark_entry__")
    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_prepared_plan_cache_honesty_guard(spark, sf_dir):
    """The registry's prepared-plan cache may replay ONLY pure plan
    construction: a builder that schedules jobs at build time
    (streaming replay, layout build, write round-trip) must re-run
    end-to-end on every call. Pin both sides of the guard."""
    from lakehouse_app_spark import runtime_cache as rc
    from lakehouse_app_spark.registry import QUERIES

    # pure plan builder → second call returns the cached DataFrame
    a = QUERIES["q_project"](spark, sf_dir)
    b = QUERIES["q_project"](spark, sf_dir)
    assert a is b
    assert ("q_project" in {k[2] for k in rc._PLANS})

    # a cached plan stays executable after release_caches()
    rc.release_caches()
    assert QUERIES["q_project"](spark, sf_dir).count() > 0

    # impure builder (runs the stream during build) → never cached,
    # fresh result table per call
    c = QUERIES["q_stream_tumbling"](spark, sf_dir)
    d = QUERIES["q_stream_tumbling"](spark, sf_dir)
    assert c is not d
    assert "q_stream_tumbling" not in {k[2] for k in rc._PLANS}
