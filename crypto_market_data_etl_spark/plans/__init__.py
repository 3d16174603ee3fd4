"""End-to-end query plans + DuckDB oracle SQL (driver contract).

``core``        — the reference's operator surface mapped onto driver testdata.
``extensions``  — LLM-data-pipeline operators (dedup/similarity/text/multimodal).

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLES: dict[str, str]`` with matching keys/column names (column names are
hash-compared by the driver).
"""

from . import core, extensions  # noqa: F401


def all_queries():
    """Driver-gated queries (kept at exactly 50 — the driver's CORRECTNESS
    gate records at most 50 rows; see core.QUERIES comment)."""
    q = dict(core.QUERIES)
    q.update(extensions.QUERIES)
    return q


def all_oracles():
    o = dict(core.ORACLES)
    o.update(extensions.ORACLES)
    return o


def variant_queries():
    """Physical-variant queries verified outside the driver gate (selfcheck +
    pytest): same oracle as a gated query, alternate physical plan."""
    q = dict(core.VARIANT_QUERIES)
    q.update(extensions.VARIANT_QUERIES)
    return q


def variant_oracles():
    o = dict(core.VARIANT_ORACLES)
    o.update(extensions.VARIANT_ORACLES)
    return o


def query_counts() -> dict[str, int]:
    """Registry-derived query counts — the single source for every
    "N oracle queries" claim in docs/commit summaries (round-5 verdict:
    hand-counted claims drifted off by one). ``total`` = gate + variants;
    ``entry()`` is q09 and is not an extra query."""
    gate, variants = len(all_queries()), len(variant_queries())
    return {
        "gate": gate,
        "variants": variants,
        "total": gate + variants,
        "gate_oracles": len(all_oracles()),
        "variant_oracles": len(variant_oracles()),
    }
