"""Time arbitrary queries() keys with the bench protocol (min-of-N).

Usage: python tools_time_keys.py q_a q_b ...   [env ITERS=5]
Prints per-key min + reps; use for isolated A/Bs outside the full
sweep. Same session config as bench.py (get_spark local[32], sf0.1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("ITERS", "5"))


def main() -> None:
    eng.load_all_queries()
    spark = eng.get_spark(app_name="time-keys")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    out = {}
    for name in sys.argv[1:]:
        fn = eng.QUERIES[name]
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        eng.release_caches()
        out[name] = {"min": min(times), "reps": times}
        print(f"{name} {min(times)} {times}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
