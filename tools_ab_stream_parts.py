"""Interleaved A/B of q_stream_user_state state-store partition count.

Round-7 verdict item 1a: the r6-tuned partitions=16 ran 3.89 s on the
loaded driver host (1.43 s on the idle r6 host). Per the within-run
protocol, measure {2,4,8,16} interleaved in ONE session and pick the
setting that is robust, not the one that won on an idle host.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng
from lakehouse_app_spark.streaming import stream_queries as sq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def run_variant(spark, parts: int) -> float:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total, last = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            import math
            total += math.fsum(pdf["value"])
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, float(total), last))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n],
            "total_value": [round(total, 4)], "last_seen": [last],
        })

    stream = sq.events_stream(spark, SF_DIR)
    stateful = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double, "
        "last_seen timestamp_ntz",
        stateStructType="n long, total double, last timestamp_ntz",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    t0 = time.perf_counter()
    df = sq.run_to_memory(stateful, "ab_user_state", output_mode="update",
                          partitions=parts)
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main():
    eng.load_all_queries()
    spark = eng.get_spark(app_name="ab-stream-parts")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    # warm: one throwaway run
    run_variant(spark, 4)
    variants = [2, 4, 8, 16]
    reps = 4
    results = {p: [] for p in variants}
    for r in range(reps):
        for p in variants:
            dt = run_variant(spark, p)
            results[p].append(dt)
            print(f"rep{r} parts={p}: {dt:.3f}s", flush=True)
    for p in variants:
        ts = sorted(results[p])
        print(f"parts={p}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} "
              f"all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
