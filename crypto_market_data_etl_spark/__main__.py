"""CLI: run any registered query or inspect its plan.

    python -m crypto_market_data_etl_spark list
    python -m crypto_market_data_etl_spark run q09_flagship [--sf-dir DIR] [--limit N]
    python -m crypto_market_data_etl_spark explain q09_flagship [--sf-dir DIR]
    python -m crypto_market_data_etl_spark oracle q09_flagship

Replaces the reference's per-script spark-submit entry points
(``spark_src/*.py`` each with argparse + main) with one registry-driven
runner; scheduling stays external (SURVEY §2.10: orchestration out of scope).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="crypto_market_data_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)
    sp = sub.add_parser("oracle")
    sp.add_argument("query")
    args = p.parse_args(argv)

    from . import plans

    # gate + variant registries: the CLI runs anything registered anywhere
    gated = plans.all_queries()
    queries = {**gated, **plans.variant_queries()}
    oracles = {**plans.all_oracles(), **plans.variant_oracles()}

    if args.cmd == "list":
        for name in sorted(queries):
            mark = "oracle" if name in oracles else "rows-only"
            tier = "gate" if name in gated else "variant"
            print(f"{name:32s} [{mark}, {tier}]")
        return 0

    if args.cmd == "oracle":
        sql = oracles.get(args.query)
        if sql is None:
            print(f"no oracle for {args.query!r}", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    if args.query not in queries:
        print(f"unknown query {args.query!r} (see `list`)", file=sys.stderr)
        return 1

    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.query}")
    try:
        df = queries[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
            print(f"({df.count()} rows total)")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
