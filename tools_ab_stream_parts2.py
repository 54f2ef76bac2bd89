"""Interleaved A/B of state-store partitions for the JVM-stateful
streams q_stream_dedup and q_stream_session (round-9 verdict item 2).

Drives the REAL query functions, overriding only run_to_memory's
partitions argument via a wrapper, {2,4,8,16} interleaved in one
session, min-of-REPS per setting.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng
from lakehouse_app_spark.streaming import stream_queries as sq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PARTS = [int(x) for x in os.environ.get("AB_PARTS", "2,4,8,16").split(",")]
REPS = int(os.environ.get("AB_REPS", "3"))
KEYS = os.environ.get("AB_KEYS", "q_stream_dedup,q_stream_session").split(",")

_orig = sq.run_to_memory
_forced = [None]


def patched(df, name_prefix, output_mode="complete", partitions=2):
    p = _forced[0] if _forced[0] is not None else partitions
    return _orig(df, name_prefix, output_mode=output_mode, partitions=p)


sq.run_to_memory = patched


def main():
    eng.load_all_queries()
    spark = eng.get_spark(app_name="ab-stream-parts2")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)

    for key in KEYS:
        fn = eng.QUERIES[key]
        _forced[0] = PARTS[0]
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()  # warm
        results = {p: [] for p in PARTS}
        for r in range(REPS):
            for p in PARTS:
                _forced[0] = p
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                results[p].append(dt)
                print(f"{key} rep{r} parts={p}: {dt:.3f}s", flush=True)
        for p in PARTS:
            ts = sorted(results[p])
            print(
                f"RESULT {key} parts={p}: min={ts[0]:.3f} "
                f"med={ts[len(ts)//2]:.3f} all={[round(t,3) for t in ts]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
