"""Extension query plans: LLM-data-pipeline operators (filled incrementally).

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
text analysis, multimodal column plumbing — each with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
