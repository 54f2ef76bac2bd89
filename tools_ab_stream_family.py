"""A/B: streaming-family timings, fresh JVM, bench-identical protocol.

Modes (argv[1]):
  alone   — time the streaming keys only (fresh-JVM baseline)
  after   — first execute the r14-new/changed batch keys once each
            (simulating the suite prefix), then time the same keys
  full    — execute EVERY batch key once (a real suite prefix), then
            time the streaming keys

Purpose: the r14 sweeps show every streaming key +8-46% vs the r13
clean sweep while the code-independent floor instruments read
identical-or-faster — which is NOT the host-throttle signature the
BASELINE narrative assumed. This tool discriminates: if `alone`
reproduces the elevation, the regression is intrinsic to the r14
streaming tree; if only `after`/`full` shows it, suite-state pollution
from the batch prefix is the cause.

Prints one JSON line {mode, floors:{...}, queries:{name:min}, reps:{...}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MODE = sys.argv[1] if len(sys.argv) > 1 else "alone"

STREAM_KEYS = [
    "q_stream_change_apply",
    "q_stream_dedup",
    "q_stream_incremental_dedup",
    "q_stream_ivf_append",
    "q_stream_session",
    "q_stream_sliding",
    "q_stream_state_timers",
    "q_stream_state_v2",
    "q_stream_topk",
    "q_stream_tumbling",
    "q_stream_user_state",
    "q_stream_vector_search",
]

# the r14-new/changed batch keys (lake_ops/sinks/layout surface)
R14_PREFIX = [
    "q_bloom_prune",
    "q_change_feed",
    "q_incremental_agg",
    "q_merge_multi",
    "q_merge_on_read",
    "q_metadata_only_agg",
    "q_null_prune",
    "q_restore_version",
    "q_time_travel",
    "q_zorder_maintain",
    "q_zorder_roundtrip",
    "q_vacuum",
    "q_compact_roundtrip",
]


def main() -> None:
    eng.load_all_queries()
    spark = eng.get_spark(app_name="ab-stream-family")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    import bench

    floors0 = {
        "tws_floor": bench._measure_tws_floor(spark),
        "timer_floor": bench._measure_timer_floor(spark),
        "stateful_floor": bench._measure_stream_floor(spark)[1],
    }

    if MODE in ("after", "full"):
        prefix = (
            R14_PREFIX
            if MODE == "after"
            else [
                k
                for k in sorted(eng.QUERIES)
                if not k.startswith("q_stream_")
            ]
        )
        t0 = time.perf_counter()
        for name in prefix:
            try:
                eng.QUERIES[name](spark, SF_DIR).write.mode(
                    "overwrite"
                ).format("noop").save()
            except Exception as ex:
                print(f"prefix {name} failed: {ex}", file=sys.stderr)
            eng.release_caches()
        print(
            f"prefix ({len(prefix)} keys) took "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    results: dict[str, float] = {}
    reps_all: dict[str, list] = {}
    for name in STREAM_KEYS:
        best, reps = bench.time_spark_query(spark, name, eng.QUERIES[name])
        results[name] = best
        reps_all[name] = reps
        print(f"{name} {best} {reps}", file=sys.stderr, flush=True)

    floors1 = {
        "tws_floor": bench._measure_tws_floor(spark, runs=1),
        "timer_floor": bench._measure_timer_floor(spark, runs=1),
    }
    print(
        json.dumps(
            {
                "mode": MODE,
                "floors_start": {k: round(v, 3) for k, v in floors0.items()},
                "floors_end": {k: round(v, 3) for k, v in floors1.items()},
                "queries": results,
                "reps": reps_all,
            }
        )
    )


if __name__ == "__main__":
    main()
