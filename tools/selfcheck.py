"""Self-check harness mirroring the driver's Spark-vs-DuckDB compare.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin on the same
parquet tables, compares row count, column name set, and an order-insensitive
per-row value fingerprint. Usage:

    python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

from crypto_market_data_etl_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return repr(v)


def fingerprint(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"OK?   {name}: rows={len(s_rows)} (no oracle — rows-only)")
            continue
        try:
            cur = con.execute(os_[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
            failures.append(name)
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            failures.append(name)
            continue
        fs, fd = fingerprint(s_rows, s_cols), fingerprint(d_rows, d_cols)
        if fs != fd:
            diff_s = list((fs - fd).items())[:3]
            diff_d = list((fd - fs).items())[:3]
            print(f"FAIL  {name}: value mismatch ({sum((fs - fd).values())} rows)")
            print(f"      cols(sorted): {sorted(s_cols)}")
            for r in diff_s:
                print(f"      spark-only: {r}")
            for r in diff_d:
                print(f"      duck-only:  {r}")
            failures.append(name)
            continue
        print(f"PASS  {name}: rows={len(s_rows)} ({dt:.1f}s)")

    if not only:
        edf = e.entry(spark)
        n = edf.count()
        print(f"entry(): rows={n} schema={[f.name for f in edf.schema.fields]}")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
