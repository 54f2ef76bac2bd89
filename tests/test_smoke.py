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
