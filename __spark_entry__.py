"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``crypto_market_data_etl_spark`` (plans/core.py and
plans/extensions.py); this module only adapts it to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crypto_market_data_etl_spark import plans
from crypto_market_data_etl_spark.plans.core import q09_flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §3.3: derive → cumsum → dollar bars → as-of
    join) on /root/testdata/sf0.001."""
    return q09_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same column names/aliases)."""
    return plans.all_oracles()
