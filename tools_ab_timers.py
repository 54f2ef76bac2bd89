"""Round-11 interleaved A/B: q_stream_state_timers RocksDB commit cost.

Variants (everything else identical, same session, interleaved):
  A: round-10 shipped confs (changelog OFF, trackRows OFF)
  B: changelog checkpointing ON (commit writes a delta, snapshot is
     deferred to the async maintenance thread — off the critical path
     of a 2-batch bounded replay)
  C: B + maintenanceInterval 10 min (maintenance never wakes mid-run)
Paired min-of-N per the frozen protocol; hashes compared across
variants to prove output-identical.
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))

spark = eng.get_spark(app_name="ab-timers")
spark.sparkContext.setLogLevel("ERROR")

from lakehouse_app_spark.streaming.stream_queries import (  # noqa: E402
    events_stream,
    run_tws,
    session_timeout_transform,
)

VARIANTS = {
    "A_ship": {},
    "B_chlog": {
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing."
        "enabled": "true",
    },
    "C_chlog_maint": {
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing."
        "enabled": "true",
        "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
    },
}


def run(confs: dict) -> tuple[float, int, str]:
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        t0 = time.perf_counter()
        keyed = session_timeout_transform(spark, events_stream(spark, SF))
        res = run_tws(spark, keyed, "ab_timers", partitions=16)
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

print("\nmins:", {k: round(min(v), 3) for k, v in times.items()})
print("hash-identical across variants:", len(set(hashes.values())) == 1,
      hashes)
