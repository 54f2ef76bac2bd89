"""Profile the transformWithStateInPandas fixed floor (round-9 item 1).

Runs the bench floor probe repeatedly in one session, printing each
run's wall time, and uses JVM-side query progress to decompose where
the time goes (trigger durations). Also probes worker-process churn
via /proc to see whether the TWS driver-worker + task workers are
fresh-forked per query (no reuse → each query pays interpreter+import
startup again).
"""
import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng


def list_py_workers():
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode(errors="replace").replace("\0", " ")
            if "pyspark" in cmd and ("daemon" in cmd or "worker" in cmd):
                out.append((int(pid), cmd[:120]))
        except OSError:
            pass
    return out


def main():
    spark = eng.get_spark(app_name="tws-profile")
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

    def once(i, partitions=2, provider="rocksdb"):
        stream = spark.readStream.schema(schema).parquet(src)
        out = stream.groupBy("k").transformWithStateInPandas(
            statefulProcessor=_One(),
            outputStructType="k long, n long",
            outputMode="Update",
            timeMode="None",
        )
        scoped = {}
        if provider == "rocksdb":
            scoped[
                "spark.sql.streaming.stateStore.providerClass"
            ] = (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        prev = {k: spark.conf.get(k, None) for k in scoped}
        for k, v in scoped.items():
            spark.conf.set(k, v)
        before = {p for p, _ in list_py_workers()}
        t0 = time.perf_counter()
        try:
            res = run_to_memory(
                out, f"_tws_prof_{i}", output_mode="update",
                partitions=partitions,
            )
            res.count()
        finally:
            for k, old in prev.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
        dt = time.perf_counter() - t0
        after = {p for p, _ in list_py_workers()}
        print(
            f"run {i} provider={provider} parts={partitions}: "
            f"{dt:.3f}s  workers new={len(after - before)} "
            f"gone={len(before - after)} alive={len(after)}",
            flush=True,
        )
        return dt

    # Baseline: 5 consecutive rocksdb runs (does the floor amortize?)
    for i in range(5):
        once(i)
    # partitions sweep
    for p in (1, 2, 8):
        once(f"p{p}", partitions=p)
    # HDFS provider comparison (TWS requires rocksdb? check error)
    try:
        once("hdfs", provider="default")
    except Exception as e:
        print("default provider failed:", str(e)[:200])


if __name__ == "__main__":
    main()
