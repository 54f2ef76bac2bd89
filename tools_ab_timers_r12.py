"""Round-12 q_stream_state_timers attack (verdict item 3).

Two measurements in one fresh bench-like session:

1. Interleaved knob A/B (paired min-of-N, hash-compared):
     A_ship  — shipped confs (r11 tree)
     B_noval — state-store commit/format/schema validation OFF
               (per-batch validation work the bounded replay never
               benefits from; crash-safety features, not semantics)
2. The DOUBLE-TWS floor, isolated: a minimal 1-row/1-key EventTime
   stream whose single timer fires in the mandatory no-data batch —
   exactly q_stream_state_timers' 2-micro-batch lifecycle with zero
   data volume. state_timers_min − timer_floor is then the pure
   data-scaled cost (shuffle + 1500 keys of state + Arrow), and the
   floor itself is the irreducible API cost of the 2-batch replay.

Run: python tools_ab_timers_r12.py  (REPS=n to override)
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "4"))

spark = eng.get_spark(app_name="ab-timers-r12")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_app_spark.streaming.stream_queries import (  # noqa: E402
    _checkpoint_root,
    events_stream,
    run_tws,
    session_timeout_transform,
)

VARIANTS = {
    "A_ship": {},
    "B_noval": {
        "spark.sql.streaming.stateStore.commitValidation.enabled": "false",
        "spark.sql.streaming.stateStore.formatValidation.enabled": "false",
        "spark.sql.streaming.stateStore.stateSchemaCheck": "false",
    },
}


def run(confs: dict) -> tuple[float, int, str]:
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        t0 = time.perf_counter()
        keyed = session_timeout_transform(spark, events_stream(spark, SF))
        res = run_tws(spark, keyed, "ab_timers_r12", partitions=16)
        rows = res.collect()
        dt = time.perf_counter() - t0
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    h = hashlib.sha256(
        "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
    ).hexdigest()[:12]
    return dt, len(rows), h


def timer_floor_once() -> float:
    """Minimal 2-batch TWS replay: 1 row, 1 key, EventTime + a timer
    that fires in the no-data batch — the state_timers lifecycle with
    zero data volume."""
    import tempfile

    import pandas as pd  # noqa: F401

    from pyspark.sql.streaming import StatefulProcessor

    src = tempfile.mkdtemp(prefix="timer_floor_src_", dir=_checkpoint_root())
    spark.range(1).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts_l"),
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    class _OneTimer(StatefulProcessor):
        def init(self, handle):
            self.h = handle
            self.s = handle.getValueState("s", "n long")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as _pd

            n = sum(len(p) for p in rows)
            self.s.update((int(n),))
            # fires when the final no-data batch floors the watermark
            self.h.registerTimer(0)
            yield _pd.DataFrame({"k": [key[0]], "n": [n], "src": ["data"]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as _pd

            got = self.s.get()
            self.s.clear()
            yield _pd.DataFrame(
                {"k": [key[0]], "n": [got[0] if got else -1], "src": ["timer"]}
            )

        def close(self):
            pass

    stream = spark.readStream.schema(schema).parquet(src)
    keyed = (
        stream.withWatermark("ts_l", "0 seconds")
        .groupBy("k")
        .transformWithStateInPandas(
            statefulProcessor=_OneTimer(),
            outputStructType="k long, n long, src string",
            outputMode="Update",
            timeMode="EventTime",
        )
    )
    t0 = time.perf_counter()
    out = run_tws(spark, keyed, "timer_floor", partitions=2)
    n = out.count()
    dt = time.perf_counter() - t0
    assert n == 2, f"expected data+timer rows, got {n}"
    return dt


# warm once (parquet footer cache, daemon pool, staged dir)
run(VARIANTS["A_ship"])

times: dict[str, list[float]] = {k: [] for k in VARIANTS}
hashes: dict[str, str] = {}
for rep in range(REPS):
    for name, confs in VARIANTS.items():
        dt, n, h = run(confs)
        times[name].append(dt)
        hashes.setdefault(name, h)
        assert hashes[name] == h, f"{name} nondeterministic"
        print(f"rep{rep} {name}: {dt:.3f}s rows={n} hash={h}", flush=True)

floors = [round(timer_floor_once(), 3) for _ in range(3)]

print("\nmins:", {k: round(min(v), 3) for k, v in times.items()})
print("hash-identical across variants:", len(set(hashes.values())) == 1,
      hashes)
print("double-TWS timer floor (2-batch, 1-row) reps:", floors,
      "min", min(floors))
best = min(min(v) for v in times.values())
print(f"data-scaled residual above timer floor: {best - min(floors):.3f}s")
