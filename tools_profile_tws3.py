"""Track fresh python process lifetimes during a steady-state TWS run."""
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng

SEEN: dict[int, list] = {}
STOP = False


def poller(t_base):
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
                SEEN[p] = [now, now, cmd[:150]]
            else:
                SEEN[p][1] = now
        time.sleep(0.02)


def main():
    global STOP
    spark = eng.get_spark(app_name="tws-profile3")
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StatefulProcessor

    from lakehouse_app_spark.sources.pb_vendor import (
        inject_worker_pythonpath,
        protobuf_runtime_dir,
    )
    from lakehouse_app_spark.streaming.stream_queries import (
        _checkpoint_root,
        run_to_memory,
    )

    pb_dir = protobuf_runtime_dir()
    if pb_dir:
        inject_worker_pythonpath(spark, pb_dir)

    src = tempfile.mkdtemp(prefix="tws_prof_src_", dir=_checkpoint_root())
    spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    class _One(StatefulProcessor):
        def init(self, handle):
            self.s = handle.getValueState("s", "n long")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as _pd

            n = sum(len(p) for p in rows)
            self.s.update((int(n),))
            yield _pd.DataFrame({"k": [key[0]], "n": [n]})

        def close(self):
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    def once(i):
        stream = spark.readStream.schema(schema).parquet(src)
        out = stream.groupBy("k").transformWithStateInPandas(
            statefulProcessor=_One(),
            outputStructType="k long, n long",
            outputMode="Update",
            timeMode="None",
        )
        t0 = time.perf_counter()
        run_to_memory(out, f"_twsp3_{i}", output_mode="update", partitions=2)
        return time.perf_counter() - t0

    once("warm0")  # warm up (cold JVM paths)
    once("warm1")

    t_base = time.perf_counter()
    th = threading.Thread(target=poller, args=(t_base,), daemon=True)
    th.start()
    time.sleep(0.2)
    baseline = set(SEEN)
    t0 = time.perf_counter() - t_base
    dt = once("timed")
    t1 = time.perf_counter() - t_base
    time.sleep(0.3)
    STOP = True
    th.join()
    print(f"timed run: {dt:.3f}s window [{t0:.3f},{t1:.3f}]")
    for p, (first, last, cmd) in sorted(SEEN.items()):
        if p in baseline:
            continue
        print(f"  pid {p}: [{first:.3f} .. {last:.3f}] life={last-first:.3f}s {cmd[:110]}")
    spark.stop()


if __name__ == "__main__":
    main()
