"""Bisect the r4 x06_lsh_buckets bench regression (1.54s r3 -> 5.16s r4).

Reproduces the full-bench conditions (same session, same warmup, best-of-3)
and times x06 under three scenarios:

  A. isolated (x06 only)                  -> r1-r3-like number expected
  B. after q29 + q30 (bench order)        -> r4-like number if streaming
                                             queries / leftover memory sink
                                             pollute the session
  C. after q29 + q30 + sink-drop hygiene  -> recovered number if the memory
                                             sink table was the cause

Usage: python tools/bisect_x06.py [A|B|C]  (one scenario per process so the
session state is honest).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    scenario = sys.argv[1] if len(sys.argv) > 1 else "A"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name=f"bisect_x06_{scenario}")
    from crypto_market_data_etl_spark import plans
    from crypto_market_data_etl_spark.schemas import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()

    qs = plans.all_queries()
    qs.update(plans.variant_queries())

    def run(name: str, repeats: int = 3) -> float:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
        return best

    if scenario in ("B", "C"):
        run("q29_asof_adaptive")
        run("q30_stream_dollar_bars")
        if scenario == "C":
            for tbl in spark.catalog.listTables():
                if tbl.tableType == "TEMPORARY":
                    spark.catalog.dropTempView(tbl.name)
            spark.catalog.clearCache()
            print("# dropped temp views + cleared cache", file=sys.stderr)

    if scenario in ("D", "E"):
        # full bench prefix in bench order
        import bench as bench_mod

        for name in bench_mod.HEADLINE:
            if name == "x06_lsh_buckets":
                break
            run(name)
        if scenario == "E":
            for tbl in spark.catalog.listTables():
                if tbl.tableType == "TEMPORARY":
                    spark.catalog.dropTempView(tbl.name)
            spark.catalog.clearCache()
            print("# dropped temp views + cleared cache", file=sys.stderr)

    x06 = run("x06_lsh_buckets")
    print(f"RESULT scenario={scenario} x06={x06:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
