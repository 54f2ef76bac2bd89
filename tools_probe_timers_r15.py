"""Decompose q_stream_state_timers' cost above the TWS floor (r15).

Arms, interleaved in ONE session (min-of-N each):
  full16 / full8   — the real sessionizer at 16 / 8 state partitions
  nostate16        — same topology + same Arrow volume, but the
                     processor touches NO state and registers NO
                     timers (pure pass-through count): isolates the
                     state/timer RPC + RocksDB share
  notimer16        — state get/update per key but no timers and
                     EventTime->None time mode is not possible with
                     watermark; keep EventTime, skip register: isolates
                     the timer-registration + expiry share

Prints per-arm reps; differences attribute the above-floor delta.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "4"))

eng.load_all_queries()
spark = eng.get_spark(app_name="probe-timers-r15")
spark.sparkContext.setLogLevel("ERROR")

from lakehouse_app_spark.sources.pb_vendor import (  # noqa: E402
    inject_worker_pythonpath,
    protobuf_runtime_dir,
)
from lakehouse_app_spark.streaming.stream_queries import (  # noqa: E402
    events_stream,
    run_tws,
    session_timeout_transform,
)

pb_dir = protobuf_runtime_dir()
if pb_dir:
    inject_worker_pythonpath(spark, pb_dir)

from pyspark.sql.streaming import StatefulProcessor  # noqa: E402


def _variant_transform(stream, mode: str):
    """Pass-through / state-only variants with the full sessionizer's
    Arrow volume and output schema."""

    class Variant(StatefulProcessor):
        def init(self, handle):
            self.h = handle
            self.sess = handle.getValueState(
                "sess", "start long, last long, n long, timer long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = sum(len(p) for p in rows)
            if mode == "state":
                got = self.sess.get()
                prev = 0 if got is None else got[2]
                self.sess.update((0, 0, prev + n, 0))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": pd.Series(
                        [0], dtype="datetime64[us]"
                    ),
                    "session_end": pd.Series([0], dtype="datetime64[us]"),
                    "n": [n],
                    "closed_by": ["gap"],
                }
            )

        def close(self):
            pass

    return (
        stream.withColumn("ts_l", F.col("ts").cast("timestamp"))
        .withWatermark("ts_l", "0 seconds")
        .select("user_id", "ts_l")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Variant(),
            outputStructType="user_id long, session_start timestamp_ntz, "
            "session_end timestamp_ntz, n long, closed_by string",
            outputMode="Update",
            timeMode="EventTime",
        )
    )


def run_arm(name: str, parts: int, mode: str) -> float:
    stream = events_stream(spark, SF_DIR)
    if mode == "full":
        keyed = session_timeout_transform(spark, stream)
    else:
        keyed = _variant_transform(stream, mode)
    t0 = time.perf_counter()
    run_tws(spark, keyed, f"probe_{name}", partitions=parts)
    return time.perf_counter() - t0


ARMS = [
    ("full16", 16, "full"),
    ("full8", 8, "full"),
    ("nostate16", 16, "none"),
    ("state16", 16, "state"),
]


def main():
    for name, parts, mode in ARMS:  # warm one rep each
        run_arm(name, parts, mode)
    res = {name: [] for name, _, _ in ARMS}
    for _ in range(REPS):
        for name, parts, mode in ARMS:
            res[name].append(round(run_arm(name, parts, mode), 3))
    for name, reps in res.items():
        print(f"{name}: min={min(reps):.3f} reps={reps}")


if __name__ == "__main__":
    main()
