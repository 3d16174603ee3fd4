"""Record the variant-query oracle sweep as a per-round committed artifact.

The driver's CORRECTNESS gate records exactly 50 rows; the physical-
variant queries (``plans.variant_queries()``) are verified only by pytest +
``tools/selfcheck.py`` — with no committed round-over-round record, a
variant regression is invisible to the driver's audit trail (round-5
verdict ask #2). This runs the SAME Spark-vs-DuckDB compare selfcheck uses
(row count + column set + order-insensitive value fingerprint) over every
variant at the driver's correctness scale and writes
``SELFCHECK_r{N}.json`` in the CORRECTNESS shape:

    {name: {rows_match, schema_match, hash_match, spark_rows,
            oracle_rows, err}}

Variants with no oracle (none today) would record a rows-only row with
``hash_match: null``, mirroring the driver's weaker check.

Usage: python tools/record_selfcheck.py <round> [sf_dir]
       (writes /root/repo/SELFCHECK_r{round:02d}.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selfcheck import TABLES, fingerprint  # noqa: E402

from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def run_one(spark, con, fn, sql):
    """One variant through the driver-faithful compare. Returns the
    CORRECTNESS row dict."""
    row = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": None if sql is None else False,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        s_pdf = fn(spark).toPandas()
        row["spark_rows"] = len(s_pdf)
    except Exception as ex:
        row["err"] = f"spark: {ex}"
        return row
    if sql is None:  # rows-only contract (driver's weaker check)
        try:
            fingerprint(s_pdf)
        except TypeError as ex:
            row["err"] = f"uncanonicalizable: {ex}"
            return row
        row["rows_match"] = row["schema_match"] = True
        return row
    try:
        d_pdf = con.execute(sql).df()
        row["oracle_rows"] = len(d_pdf)
    except Exception as ex:
        row["err"] = f"duckdb: {ex}"
        return row
    row["rows_match"] = len(s_pdf) == len(d_pdf)
    row["schema_match"] = sorted(s_pdf.columns) == sorted(d_pdf.columns)
    if not row["schema_match"]:
        row["err"] = (
            f"columns spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}"
        )
        return row
    try:
        row["hash_match"] = fingerprint(s_pdf) == fingerprint(d_pdf)
    except TypeError as ex:
        row["err"] = f"uncanonicalizable: {ex}"
        row["hash_match"] = False
    return row


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_path = f"/root/repo/SELFCHECK_r{rnd:02d}.json"

    import duckdb

    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from crypto_market_data_etl_spark import plans

    vq, vo = plans.variant_queries(), plans.variant_oracles()
    results: dict[str, dict] = {}
    t0 = time.time()
    for name in sorted(vq):
        fn = vq[name]
        results[name] = run_one(
            spark, con, lambda s, fn=fn: fn(s, sf_dir), vo.get(name)
        )
        r = results[name]
        ok = r["rows_match"] and r["schema_match"] and r["hash_match"] in (True, None)
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {r}", flush=True)
    payload = {
        "sf_dir": sf_dir,
        "n_variants": len(vq),
        "wall_sec": round(time.time() - t0, 1),
        "rows": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    spark.stop()
    n_green = sum(
        1
        for r in results.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"] in (True, None)
    )
    print(f"\n{out_path}: {n_green}/{len(results)} green")
    return 0 if n_green == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
