"""End-to-end query plans + DuckDB oracle SQL (driver contract).

``core``        — the reference's operator surface mapped onto driver testdata.
``extensions``  — LLM-data-pipeline operators (dedup/similarity/text/multimodal).

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLES: dict[str, str]`` with matching keys/column names (column names are
hash-compared by the driver).
"""

from . import core, extensions  # noqa: F401


def all_queries():
    q = dict(core.QUERIES)
    q.update(extensions.QUERIES)
    return q


def all_oracles():
    o = dict(core.ORACLES)
    o.update(extensions.ORACLES)
    return o
