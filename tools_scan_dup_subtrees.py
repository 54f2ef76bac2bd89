"""Flag queries whose physical plan scans the same parquet location
more than once — candidates for duplicated-subtree elimination
(guide §7.2). InMemoryTableScan consumers are fine (cache dedups at
runtime); repeated `Scan parquet <loc>` nodes in the EXECUTED tree
are real repeated I/O unless an Exchange is reused.

Prints: key, {location: count} for locations with count > 1.
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    eng.load_all_queries()
    spark = eng.get_spark(app_name="scan-dup-subtrees")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    names = sys.argv[1:] or sorted(eng.QUERIES)
    for name in names:
        if name.startswith("q_stream"):
            continue  # streaming replays build their own topologies
        try:
            df = eng.QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: PLAN FAILED {ex}", flush=True)
            continue
        finally:
            eng.release_caches()
        # count scan locations in the detail section; drop the
        # InMemoryRelation build subtrees (executed once at runtime)
        locs = Counter()
        in_mem_depth = None
        for line in plan.splitlines():
            m = re.search(r"Location: InMemoryFileIndex \[(.*?)\]", line)
            if m:
                locs[m.group(1).split("/")[-1]] += 1
        dups = {k: v for k, v in locs.items() if v > 1}
        if dups:
            n_cached = plan.count("InMemoryRelation")
            print(f"{name}: {dups} (InMemoryRelation x{n_cached})", flush=True)


if __name__ == "__main__":
    main()
