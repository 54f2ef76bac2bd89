"""Count Spark jobs per declared query (one warm execution each).

A query's wall time at bench scale is roughly (jobs × scheduling
floor) + real work; keys scheduling many jobs (scalar collects,
iterative loops, multi-action write paths) pay the floor repeatedly.
Prints keys sorted by job count. Skips streaming keys (their
micro-batch jobs are the replay, counted differently).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    eng.load_all_queries()
    spark = eng.get_spark(app_name="count-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    eng.load_tables(spark, SF_DIR)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    tracker = spark.sparkContext.statusTracker()
    names = sys.argv[1:] or sorted(eng.QUERIES)
    rows = []
    for name in names:
        if name.startswith("q_stream"):
            continue
        try:
            # warm pass: layout builds / corpus scalars memoize
            eng.QUERIES[name](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            eng.release_caches()
            ids0 = tracker.getJobIdsForGroup(None) or []
            before = max(ids0) if ids0 else -1
            eng.QUERIES[name](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            eng.release_caches()
            ids1 = tracker.getJobIdsForGroup(None) or []
            after = max(ids1) if ids1 else -1
            rows.append((after - before, name))
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {ex}", file=sys.stderr)
    rows.sort(reverse=True)
    for n, name in rows:
        print(f"{n:4d}  {name}")


if __name__ == "__main__":
    main()
