"""Dump .explain("formatted") for queries() keys to plans/r15/.

Usage: python tools_dump_plans.py [--suffix before|after] q_a q_b ...
       python tools_dump_plans.py --suffix before --all

Writes plans/r15/<key>_<suffix>.txt. Uses the bench session config
(get_spark local[32], sf0.1) so the plans match what the bench runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r15")


def main() -> None:
    args = sys.argv[1:]
    suffix = "before"
    if args and args[0] == "--suffix":
        suffix = args[1]
        args = args[2:]
    eng.load_all_queries()
    spark = eng.get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    names = sorted(eng.QUERIES) if args == ["--all"] else args
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            df = eng.QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 - record the failure in the file
            plan = f"EXPLAIN FAILED: {ex}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
        eng.release_caches()


if __name__ == "__main__":
    main()
