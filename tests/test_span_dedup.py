"""Independent-reimplementation tests for the substring-granular
dedup tier (operators/span_dedup.py): a THIRD implementation of each
algorithm in plain Python, compared exactly against the Spark result.
The DuckDB oracle (tests/test_parity.py) proves cross-engine SQL
parity; these prove the SQL itself computes the declared algorithm —
window extraction, shared-span detection, interval merging, and MOSS
winnowing with the rightmost-min tie rule."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from lakehouse_app_spark import QUERIES
from lakehouse_app_spark.operators.span_dedup import (
    SPAN_TOKENS,
    WINNOW_K,
    WINNOW_W,
)
from lakehouse_app_spark.sources.tables import load_tables


def _docs(spark, sf_dir) -> list[tuple[int, str]]:
    rows = load_tables(spark, sf_dir).documents.select("doc_id", "text").collect()
    return [(r["doc_id"], r["text"]) for r in rows]


def test_dedup_spans_matches_pure_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    gram_docs: dict[tuple, set] = defaultdict(set)
    toks = {}
    for doc_id, text in docs:
        tk = text.split(" ")
        toks[doc_id] = tk
        for i in range(len(tk) - SPAN_TOKENS + 1):
            gram_docs[tuple(tk[i : i + SPAN_TOKENS])].add(doc_id)
    shared = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expected = {}
    for doc_id, tk in toks.items():
        spans = [
            (i, i + SPAN_TOKENS)
            for i in range(len(tk) - SPAN_TOKENS + 1)
            if tuple(tk[i : i + SPAN_TOKENS]) in shared
        ]
        if not spans:
            continue
        covered, cur_s, cur_e = 0, *spans[0]
        for s, e in spans[1:]:
            if s > cur_e:
                covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        expected[doc_id] = (len(tk), covered, round(covered / len(tk), 6))
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in QUERIES["q_dedup_spans"](spark, sf_dir).collect()
    }
    assert got == expected
    # merge soundness: coverage can never exceed the doc (unmerged
    # stride-1 spans would sum to ~SPAN_TOKENS x n_tokens)
    assert all(dup <= n for n, dup, _ in got.values())


def _winnow(text: str) -> set[int]:
    """Reference winnowing: Karp-Rabin gram hashes, window of
    WINNOW_W, keep each window's (min fp, rightmost tie) as fpu."""
    fps = []
    for i in range(len(text) - WINNOW_K + 1):
        h = 0
        for c in text[i : i + WINNOW_K]:
            h = (h * 31 + ord(c)) % 2147483647
        fps.append(h * 1024 + (1023 - i))
    return {
        min(fps[p : p + WINNOW_W]) for p in range(len(fps) - WINNOW_W + 1)
    }


def test_winnow_fingerprint_matches_pure_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    expected = {}
    for doc_id, text in docs:
        if len(text) < WINNOW_K + WINNOW_W - 1:
            continue
        sel = _winnow(text)
        fp = [u // 1024 for u in sel]
        pos = [1023 - (u % 1024) for u in sel]
        expected[doc_id] = (len(sel), sum(fp), min(fp), sum(pos))
    got = {
        r["doc_id"]: (r["n_fp"], r["fp_sum"], r["fp_min"], r["pos_sum"])
        for r in QUERIES["q_winnow_fingerprint"](spark, sf_dir).collect()
    }
    assert got == expected
    # density: each selected fingerprint is the min of >=1 of the
    # (n_ch - k - w + 2) windows, and one value can win at most w
    # consecutive windows
    for doc_id, text in docs:
        if doc_id not in expected:
            continue
        n_windows = len(text) - WINNOW_K - WINNOW_W + 2
        n_fp = expected[doc_id][0]
        assert n_windows / WINNOW_W <= n_fp <= n_windows
