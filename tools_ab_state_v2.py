"""Interleaved A/B of q_stream_state_v2 state-store partition count
(RocksDB provider + transformWithStateInPandas), idle and loaded.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng
from lakehouse_app_spark.streaming import stream_queries as sq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PARTS = [int(x) for x in os.environ.get("AB_PARTS", "4,8,16").split(",")]
REPS = int(os.environ.get("AB_REPS", "3"))


def run_variant(spark, parts: int) -> float:
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    from lakehouse_app_spark.sources.pb_vendor import (
        inject_worker_pythonpath,
        protobuf_runtime_dir,
    )

    pb_dir = protobuf_runtime_dir()
    if pb_dir:
        inject_worker_pythonpath(spark, pb_dir)

    class UserSummary(StatefulProcessor):
        def init(self, handle) -> None:
            self.agg = handle.getValueState("agg", "n long, mx double, nt long")
            self.counts = handle.getMapState(
                "counts", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timer_values):
            first = not self.agg.exists()
            n, mx, nt = (0, None, 0) if first else self.agg.get()
            local: dict = {}
            for pdf in rows:
                n += len(pdf)
                bmx = float(pdf["value"].max())
                mx = bmx if mx is None or bmx > mx else mx
                for etype, cnt in pdf["event_type"].value_counts().items():
                    local[etype] = local.get(etype, 0) + int(cnt)
            for etype, cnt in local.items():
                prev = None if first else self.counts.getValue((etype,))
                if prev is None:
                    nt += 1
                    self.counts.updateValue((etype,), (cnt,))
                else:
                    self.counts.updateValue((etype,), (prev[0] + cnt,))
            self.agg.update((int(n), float(mx), int(nt)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [nt],
                    "max_value": [round(float(mx), 4)],
                }
            )

        def close(self) -> None:
            pass

    stream = sq.events_stream(spark, SF_DIR)
    stateful = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserSummary(),
        outputStructType="user_id long, n_events long, n_types long, "
        "max_value double",
        outputMode="Update",
        timeMode="None",
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    t0 = time.perf_counter()
    try:
        df = sq.run_to_memory(
            stateful, "ab_state_v2", output_mode="update", partitions=parts
        )
        df.write.mode("overwrite").format("noop").save()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return time.perf_counter() - t0


def main():
    eng.load_all_queries()
    spark = eng.get_spark(app_name="ab-state-v2")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    run_variant(spark, PARTS[0])  # warm
    results = {p: [] for p in PARTS}
    for r in range(REPS):
        for p in PARTS:
            dt = run_variant(spark, p)
            results[p].append(dt)
            print(f"rep{r} parts={p}: {dt:.3f}s", flush=True)
    for p in PARTS:
        ts = sorted(results[p])
        print(f"parts={p}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} "
              f"all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
