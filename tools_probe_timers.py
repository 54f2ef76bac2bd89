"""Empirical probe: transformWithStateInPandas EventTime timer boundary.

Two keys, watermark delay 0s. Key A's event at 10:00, key B's at 11:00
(the global max → final watermark = 11:00). Each key registers a timer
at its own event ts. Which timers fire in the no-data batch decides
whether expiry is `timer < watermark` (only A) or `timer <= watermark`
(A and B) — the boundary the q_stream_state_timers oracle must encode.
Also prints the watermark seen inside handleExpiredTimer.
"""
import sys, tempfile, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

import lakehouse_app_spark as eng

spark = eng.get_spark(app_name="timer-probe")
spark.sparkContext.setLogLevel("ERROR")

from lakehouse_app_spark.sources.pb_vendor import (
    inject_worker_pythonpath,
    protobuf_runtime_dir,
)

pb = protobuf_runtime_dir()
assert pb, "no protobuf source"
inject_worker_pythonpath(spark, pb)

from pyspark.sql.streaming import StatefulProcessor

src = tempfile.mkdtemp(prefix="timer_probe_")
spark.createDataFrame(
    [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00")],
    "k long, ts_s string",
).select("k", F.to_timestamp("ts_s").alias("ts")).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema


class P(StatefulProcessor):
    def init(self, handle):
        self.h = handle
        self.s = handle.getValueState("s", "last long")

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        last = 0
        for pdf in rows:
            last = max(last, int(pdf["ts"].max().value // 1_000_000))
        self.s.update((last,))
        self.h.registerTimer(last)  # timer at the event ts itself (ms)
        yield pd.DataFrame(
            {"k": [key[0]], "kind": ["input"], "at_ms": [last]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        yield pd.DataFrame(
            {
                "k": [key[0]],
                "kind": ["timer"],
                "at_ms": [timerValues.getCurrentWatermarkInMs()],
            }
        )

    def close(self):
        pass


stream = spark.readStream.schema(schema).parquet(src)
out = (
    stream.withWatermark("ts", "0 seconds")
    .groupBy("k")
    .transformWithStateInPandas(
        statefulProcessor=P(),
        outputStructType="k long, kind string, at_ms long",
        outputMode="Update",
        timeMode="EventTime",
    )
)
from lakehouse_app_spark.streaming.stream_queries import run_to_memory

scoped = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
}
for kk, vv in scoped.items():
    spark.conf.set(kk, vv)
t0 = time.perf_counter()
res = run_to_memory(out, "timer_probe", output_mode="update", partitions=2)
rows = sorted((r.k, r.kind, r.at_ms) for r in res.collect())
print("ELAPSED", round(time.perf_counter() - t0, 2))
for r in rows:
    print("ROW", r)
fired = {k for (k, kind, _) in rows if kind == "timer"}
print("FIRED:", sorted(fired))
print("BOUNDARY:", "<= (non-strict)" if 2 in fired else "< (strict)" if 1 in fired else "NONE FIRED")
