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


from crypto_market_data_etl_spark import plans

# gate + variant registries: variants get the identical oracle compare here
# even though the driver only sees the gate 50 (test_gate_contract.py)
QUERIES = {**entrymod.queries(), **plans.variant_queries()}
ORACLES = {**entrymod.oracle_sql(), **plans.variant_oracles()}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle_con, name):
    # pandas materialization on BOTH sides, like the driver's gate — dtype
    # divergence (e.g. DuckDB HUGEINT → float64 vs Spark int64) must fail here
    s_pdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLES:
        fingerprint(s_pdf)  # rows-only rows must still canonicalize
        return
    d_pdf = oracle_con.execute(ORACLES[name]).df()
    assert sorted(s_pdf.columns) == sorted(d_pdf.columns)
    assert len(s_pdf) == len(d_pdf)
    assert fingerprint(s_pdf) == fingerprint(d_pdf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
