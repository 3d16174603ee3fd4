"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the flagship pipeline + a representative slice of every
operator family (scan+agg, multi-join, windows, bars+asof, dedup/LSH, ANN,
fingerprints). Each query is fully executed (collect) — not just planned.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_market_data_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q04_candles_tumbling",
    "q05_sliding_stats",
    "q08_dollar_bars",
    "q09_flagship",
    "q11_ewma",
    "x02_minhash_pairs",
    "x05_embedding_topk",
    "x06_lsh_buckets",
    "x10_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    from crypto_market_data_etl_spark import plans
    from crypto_market_data_etl_spark.schemas import TESTDATA_TABLES, load_table

    # warm up the JVM / codegen / file-index caches so per-query timings
    # measure the queries, not session startup
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()

    qs = plans.all_queries()
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best, n = float("inf"), 0
        for _ in range(repeats):  # best-of-N damps box noise
            t0 = time.time()
            n = len(fn(spark, sf_dir).collect())
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
