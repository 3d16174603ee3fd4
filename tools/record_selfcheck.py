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

Round 7 proved scale-DEPENDENT correctness bugs exist (q28's
applyInPandasWithState cross-chunk ordering passed seven rounds of sf0.01
gates and failed only at sf0.1, where groups straddle Arrow chunk
boundaries), so this also records an ``sf01_sweep`` section: the SAME
compare over BOTH registries (gate 50 + variants) at sf0.1 — the
round-7 verdict's #1 ask, now a committed per-round artifact instead of an
ad-hoc builder run.

Usage: python tools/record_selfcheck.py <round> [sf_dir] [sf01_dir]
       (writes /root/repo/SELFCHECK_r{round:02d}.json; pass an empty
       string as sf01_dir to skip the sf0.1 section)
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


def _is_green(r: dict) -> bool:
    return bool(
        r["rows_match"] and r["schema_match"] and r["hash_match"] in (True, None)
    )


def _sweep(spark, sf_dir: str, queries: dict, oracles: dict) -> dict:
    """Run every query in ``queries`` through the driver-faithful compare
    against ``sf_dir``; returns {name: CORRECTNESS-row}."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results: dict[str, dict] = {}
    for name in sorted(queries):
        fn = queries[name]
        results[name] = run_one(
            spark, con, lambda s, fn=fn: fn(s, sf_dir), oracles.get(name)
        )
        r = results[name]
        print(f"{'PASS' if _is_green(r) else 'FAIL'}  {name}: {r}", flush=True)
    con.close()
    return results


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    sf01_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_path = f"/root/repo/SELFCHECK_r{rnd:02d}.json"

    spark = get_spark(cpus=8, shuffle_partitions=8)

    import __spark_entry__ as e
    from crypto_market_data_etl_spark import plans

    vq, vo = plans.variant_queries(), plans.variant_oracles()
    t0 = time.time()
    results = _sweep(spark, sf_dir, vq, vo)
    payload = {
        "sf_dir": sf_dir,
        "n_variants": len(vq),
        "wall_sec": round(time.time() - t0, 1),
        "rows": results,
    }

    all_green = all(_is_green(r) for r in results.values())
    if sf01_dir:
        # scale sweep: gate + variants at 10x the driver's gate scale —
        # the regime where groups straddle Arrow chunk boundaries,
        # buckets overflow caps, and per-partition state actually carries
        gq, go = dict(e.queries()), dict(e.oracle_sql())
        gq.update(vq)
        go.update(vo)
        t0 = time.time()
        print(f"\n=== sf0.1 scale sweep ({len(gq)} queries) ===", flush=True)
        s_results = _sweep(spark, sf01_dir, gq, go)
        payload["sf01_sweep"] = {
            "sf_dir": sf01_dir,
            "registries": "gate+variants",
            "n_queries": len(gq),
            "wall_sec": round(time.time() - t0, 1),
            "rows": s_results,
        }
        all_green = all_green and all(_is_green(r) for r in s_results.values())

    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    spark.stop()
    n_green = sum(1 for r in results.values() if _is_green(r))
    msg = f"\n{out_path}: {n_green}/{len(results)} variants green"
    if sf01_dir:
        sg = sum(1 for r in payload["sf01_sweep"]["rows"].values() if _is_green(r))
        msg += f"; sf0.1 sweep {sg}/{payload['sf01_sweep']['n_queries']} green"
    print(msg)
    return 0 if all_green else 1


if __name__ == "__main__":
    sys.exit(main())
