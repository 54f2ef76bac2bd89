"""Measure the transformWithStateInPandas fixed floor with and
without the worker source-tree import preference (one flag per
process; run both and compare). AB_SRC=0 disables the injection."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("AB_SRC", "1") == "0":
    import lakehouse_app_spark.session as sess
    sess.prefer_worker_src_imports = lambda spark: None

import lakehouse_app_spark as eng
import bench


def main():
    eng.load_all_queries()
    spark = eng.get_spark(app_name="ab-tws-floor")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                          "/root/testdata/sf0.1"))
    print("env PYTHONPATH:",
          spark.sparkContext.environment.get("PYTHONPATH", "<unset>")[:120])
    tws = bench._measure_tws_floor(spark, runs=5)
    print(f"tws_floor: {tws:.3f}")


if __name__ == "__main__":
    main()
