"""Decompose the steady-state TWS floor via StreamingQueryProgress."""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import lakehouse_app_spark as eng


def main():
    spark = eng.get_spark(app_name="tws-profile2")
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StatefulProcessor

    from lakehouse_app_spark.sources.pb_vendor import (
        inject_worker_pythonpath,
        protobuf_runtime_dir,
    )
    from lakehouse_app_spark.streaming.stream_queries import _checkpoint_root

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

    for i in range(4):
        stream = spark.readStream.schema(schema).parquet(src)
        out = stream.groupBy("k").transformWithStateInPandas(
            statefulProcessor=_One(),
            outputStructType="k long, n long",
            outputMode="Update",
            timeMode="None",
        )
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        ckpt = tempfile.mkdtemp(prefix="ckpt_twsp_", dir=_checkpoint_root())
        t0 = time.perf_counter()
        q = (
            out.writeStream.format("memory")
            .queryName(f"_twsp_{i}")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        t_started = time.perf_counter() - t0
        q.awaitTermination()
        dt = time.perf_counter() - t0
        progs = [json.loads(p.json) for p in q.recentProgress]
        print(f"=== run {i}: total {dt:.3f}s  start() {t_started:.3f}s "
              f"batches={len(progs)}", flush=True)
        for p in progs:
            dur = p.get("durationMs", {})
            print("   durationMs:", dur)
            for so in p.get("stateOperators", []):
                keep = {k: v for k, v in so.items()
                        if isinstance(v, (int, float)) and v}
                print("   stateOp:", keep)
    spark.stop()


if __name__ == "__main__":
    main()
