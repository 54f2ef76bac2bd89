"""Host-window probe: time ONLY the DuckDB oracle side of the bench
(code-independent denominator) at sf0.1 with the bench's exact
protocol (min-of-3 per query, same views, same connection setup).

The full-suite DuckDB total has a clean band of 44-48 s on this host
(BASELINE.md); degraded windows read 49-58 s. Since the denominator
is independent of any repo code, this probe costs ~2.5 min and tells
whether launching the ~17 min full bench now would land in a clean
window. Prints one JSON line {"duck_total": s, "clean": bool}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import lakehouse_app_spark as eng

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERATIONS = 3
CLEAN_MAX = 48.5

eng.load_all_queries()
con = duckdb.connect()
for t in eng.TABLE_NAMES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/{t}.parquet')"
    )

total = 0.0
slow: dict[str, float] = {}
t_start = time.perf_counter()
for name in sorted(eng.ORACLES):
    sql = eng.ORACLES[name]
    best = float("inf")
    try:
        for _ in range(ITERATIONS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
    except Exception as ex:
        print(f"probe: {name} failed: {ex}", file=sys.stderr)
        continue
    total += best
    if best > 0.4:
        slow[name] = round(best, 3)

out = {
    "duck_total": round(total, 2),
    "clean": total <= CLEAN_MAX,
    "wall_sec": round(time.perf_counter() - t_start, 1),
    "slow": dict(sorted(slow.items(), key=lambda kv: -kv[1])[:8]),
}
print(json.dumps(out))
