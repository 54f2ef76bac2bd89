"""sf1 scaling-point study (SCALE.md's measured-curve extension).

SCALE.md's tri-scale table (sf0.001/0.01/0.1) shows Spark's total
nearly flat (floor-dominated) while DuckDB's scales with the data,
and extrapolates that the curves cross around sf1. This tool MEASURES
that point instead of extrapolating it: it materializes a synthetic
sf1 corpus by replicating the driver's sf0.1 parquet 10x with
key-stride shifts (fact AND dim keys shifted in lockstep, so join
fanouts and key cardinalities scale exactly the way TPC-H's own SF
knob scales them — dims grow with SF, nation/region stay fixed), then
times a representative cross-family subset of the registered queries
with the bench protocol (shared warm session, noop sink, paired
min-of-3 on both engines).

The replicated corpus lives under spark-warehouse/ (gitignored,
derived); /root/testdata is never written. This is a SCALE STUDY, not
the bench: BENCH_r{N}.json stays defined at sf0.1 on the full suite.
Output: one JSON line; full record written to SCALE_SF1.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Input-split sizing for a >128 MB single-file corpus (see
# session.RUNTIME_CONFS): without this the 140 MB lineitem scans as
# ~2 input tasks on 32 cores. Must be set before the session module
# reads it.
os.environ.setdefault(
    "SPARK_GRAFT_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)
)

import duckdb

import lakehouse_app_spark as eng

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "spark-warehouse", "scale_sf1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
ITER = 3

# (table, [key columns to stride-shift]); stride = max(key)+1 of the
# table OWNING the key, so every FK lands in its copy's PK range.
OWN_KEYS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# Cross-family subset: data-dominated batch keys only. Excluded by
# design: the streaming family (startup-floor-bound — its floors are
# constant in data volume, which the sf0.001->0.1 rows already prove),
# q_join_interval_bucket (its DuckDB oracle is deliberately the naive
# quadratic formulation — 8.4 s at sf0.1, ~14 min at sf1 — the bench
# already makes that point), and write-roundtrip keys (they time
# commits, not scans).
KEYS = [
    "q_scan_count",        # bare scan
    "q_agg_pricing",       # TPC-H Q1 fixed-point aggregate
    "q_agg_rollup",        # hierarchical aggregate
    "q_join_inner",        # fact-dim hash join
    "q_join_multiway",     # 5-way star join
    "q_tpch_q2",           # correlated-subquery join stack
    "q_window_running",    # running-sum window over fact
    "q_topk_per_group",    # rank-filter window
    "q_orderby_limit",     # global sort + limit
    "q_window_sessionize", # gap-based sessionization (events)
    "q_drift_ks",          # per-category exact KS over distinct values
    "q_freq_pairs",        # co-occurrence mining (events)
    "q_tokenize_wordcount",# text tokenize + count (documents)
    "q_text_stats",        # per-doc quality stats
    "q_neardup_exact",     # exact dedup (documents)
    "q_dedup_minhash",     # banded MinHash near-dup (documents)
    "q_topk_cosine",       # brute-force cosine top-k (embeddings)
    "q_ann_ivf",           # partition-pruned IVF probe (layout build amortized)
]


def build_corpus() -> None:
    if os.path.isdir(DST) and all(
        os.path.exists(os.path.join(DST, f"{t}.parquet"))
        for t in eng.TABLE_NAMES
    ):
        return
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    strides = {}
    for t, k in OWN_KEYS.items():
        strides[t] = con.execute(
            f"SELECT max({k}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
    strides["events_user"] = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    for t in eng.TABLE_NAMES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        shifted = SHIFTS.get(t, {})
        if not shifted:
            # fixed-cardinality dims (nation/region): copy once
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
            )
            continue
        sel = ", ".join(
            f"{c} + i * {strides[shifted[c]]} AS {c}" if c in shifted else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{SRC}/{t}.parquet') "
            f"CROSS JOIN generate_series(0, {COPIES - 1}) t(i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/lineitem.parquet')"
    ).fetchone()[0]
    print(f"corpus built: lineitem {n} rows", file=sys.stderr)


def main() -> None:
    build_corpus()
    eng.load_all_queries()
    from lakehouse_app_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in eng.TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{DST}/{t}.parquet')"
        )

    # Code-independent window instrument: the same subset's oracles
    # timed at sf0.1 in THIS run. BENCH_full_local.json's clean-band
    # sum for the subset gives the reference mark; a degraded host
    # shows up here without any repo code in the loop.
    con01 = duckdb.connect()
    for t in eng.TABLE_NAMES:
        con01.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )
    probe = 0.0
    for name in KEYS:
        sql = eng.ORACLES.get(name)
        if not sql:
            continue
        best = float("inf")
        for _ in range(ITER):
            t0 = time.perf_counter()
            con01.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        probe += best
    con01.close()

    rec = {"sf": "sf1-synthetic(10x-sf0.1)", "copies": COPIES,
           "iterations": ITER,
           "duck_sf01_subset_probe": round(probe, 3),
           "max_partition_bytes":
               os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"],
           "spark": {}, "duck": {}, "reps": {}}
    for name in KEYS:
        fn = eng.QUERIES[name]
        times = []
        for _ in range(ITER):
            t0 = time.perf_counter()
            df = fn(spark, DST)
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        eng.release_caches()
        rec["spark"][name] = round(min(times), 3)
        rec["reps"][name] = [round(x, 3) for x in times]
        sql = eng.ORACLES.get(name)
        if sql:
            best = float("inf")
            for _ in range(ITER):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            rec["duck"][name] = round(best, 3)
        print(
            f"{name:24s} spark {rec['spark'][name]:7.3f}  "
            f"duck {rec['duck'].get(name, -1):7.3f}",
            file=sys.stderr,
        )
    rec["spark_total"] = round(sum(rec["spark"].values()), 3)
    rec["duck_total"] = round(sum(rec["duck"].values()), 3)
    rec["ratio"] = round(rec["spark_total"] / rec["duck_total"], 3)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SCALE_SF1.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(json.dumps({k: rec[k] for k in
                      ("sf", "spark_total", "duck_total", "ratio")}))


if __name__ == "__main__":
    main()
