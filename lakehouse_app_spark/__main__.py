"""Command-line console for the engine — the analog of the
reference's notebook console (`Lakehouse Apps console.py:6-39`,
which drives list/create/deploy by hand): list the declared query
surface, run any query against a scale-factor directory, show its
optimized physical plan, or print its DuckDB oracle.

Usage:
    python -m lakehouse_app_spark list
    python -m lakehouse_app_spark run q_tpch_q3 [--sf-dir DIR] [-n 20]
    python -m lakehouse_app_spark explain q_topk_cosine [--sf-dir DIR]
    python -m lakehouse_app_spark oracle q_tpch_q3
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lakehouse_app_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list declared queries (+oracle class)")
    for c in ("run", "explain"):
        s = sub.add_parser(c)
        s.add_argument("query")
        s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if c == "run":
            s.add_argument("-n", "--rows", type=int, default=20)
    s = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    s.add_argument("query")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    from lakehouse_app_spark import ORACLES, QUERIES, load_all_queries

    load_all_queries()
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":
        for name in sorted(QUERIES):
            kind = "exact " if name in ORACLES else "rows-only"
            print(f"{kind}  {name}")
        print(f"{len(QUERIES)} queries ({len(ORACLES)} exact oracles)")
        return 0

    if args.cmd == "oracle":
        if args.query not in ORACLES:
            print(f"no oracle for {args.query!r}", file=sys.stderr)
            return 1
        print(ORACLES[args.query])
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r} (try: list)", file=sys.stderr)
        return 1

    if spark is None:
        from lakehouse_app_spark import get_spark

        spark = get_spark()
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
