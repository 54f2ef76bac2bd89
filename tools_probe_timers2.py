"""Round-11 probe: per-micro-batch anatomy of q_stream_state_timers.

Runs the sf0.1 timers replay once, polling /proc for fresh python
processes (TWS worker forks) and dumping each micro-batch's
StreamingQueryProgress durationMs breakdown. Questions it answers:
  1. How many micro-batches does the availableNow replay run?
  2. What does each batch cost (triggerExecution / addBatch)?
  3. Does the no-data timer batch fork a FRESH python worker, or
     reuse the data batch's (verdict r10 candidate b)?
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng

SEEN: dict[int, list] = {}
STOP = False


def poller(t_base: float) -> None:
    me = os.getpid()
    while not STOP:
        now = time.perf_counter() - t_base
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            p = int(pid)
            try:
                with open(f"/proc/{p}/cmdline", "rb") as fh:
                    cmd = fh.read().decode(errors="replace").replace("\0", " ")
            except OSError:
                continue
            if "python" not in cmd:
                continue
            if p not in SEEN:
                SEEN[p] = [now, now, cmd[:110]]
            else:
                SEEN[p][1] = now
        time.sleep(0.02)


def main() -> None:
    global STOP
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = eng.get_spark(app_name="timers-anatomy")
    spark.sparkContext.setLogLevel("ERROR")

    from lakehouse_app_spark.streaming.stream_queries import (
        events_stream,
        run_tws,
        session_timeout_transform,
    )

    # warm the session (parquet scan + python daemon pool) with a
    # throwaway batch job so the poller sees only stream workers
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    t_base = time.perf_counter()
    th = threading.Thread(target=poller, args=(t_base,), daemon=True)
    th.start()
    time.sleep(0.3)
    baseline_pids = set(SEEN)

    t0 = time.perf_counter()
    keyed = session_timeout_transform(spark, events_stream(spark, sf_dir))
    res = run_tws(spark, keyed, "state_timers_probe", partitions=16)
    n = res.count()
    wall = time.perf_counter() - t0
    time.sleep(0.3)
    STOP = True
    th.join(timeout=2)

    print(f"WALL {wall:.2f}s rows={n}")
    # recentProgress off the last active query is gone (stream done);
    # use the session's streams manager history via listener-free API:
    for q in spark.streams.active:
        print("still active?!", q.name)
    # run_to_memory awaits termination; grab progress from the query
    # object is not possible post-factum here, so re-run with a kept
    # handle below instead:
    print(f"fresh python procs during run: {len([p for p in SEEN if p not in baseline_pids])}")
    for p, (t_first, t_last, cmd) in sorted(SEEN.items()):
        if p in baseline_pids:
            continue
        print(f"  pid={p} first={t_first:6.2f} last={t_last:6.2f} "
              f"life={t_last-t_first:5.2f} {cmd[:90]}")

    # second run with a kept query handle for per-batch progress
    import tempfile
    from lakehouse_app_spark.streaming.stream_queries import _checkpoint_root

    keyed2 = session_timeout_transform(spark, events_stream(spark, sf_dir))
    scoped = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows":
            "false",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing."
        "enabled": "false",
    }
    for k, v in scoped.items():
        spark.conf.set(k, v)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    ckpt = tempfile.mkdtemp(prefix="ckpt_probe_", dir=_checkpoint_root())
    t0 = time.perf_counter()
    q = (
        keyed2.writeStream.format("memory")
        .queryName("timers_probe2")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    wall2 = time.perf_counter() - t0
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    print(f"\nWALL2 {wall2:.2f}s  batches={len(q.recentProgress)}")
    for pr in q.recentProgress:
        d = pr["durationMs"] if isinstance(pr, dict) else json.loads(pr.json)["durationMs"]
        pj = pr if isinstance(pr, dict) else json.loads(pr.json)
        print(f"  batch {pj['batchId']}: rows={pj['numInputRows']} "
              f"durationMs={d}")
        for op in pj.get("stateOperators", []):
            print(f"    state: updated={op.get('numRowsUpdated')} "
                  f"removed={op.get('numRowsRemoved')} "
                  f"commitMs={op.get('commitTimeMs')} ")


if __name__ == "__main__":
    main()
