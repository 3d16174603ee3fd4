"""Assemble SCALE_r14.json from per-section rung logs.

Round-14 protocol unchanged (standalone fresh-process rungs on an idle
box; this folds their logs). The round's sections are the r13 verdict
asks:

  tools/logs_r14/retrain_cycles.jsonl
      — ask #3: multi-cycle warm-retrain schedule (400k + 3 x 100k NEW
      regimes). Arms: seeded (the r12 recipe) vs seeded+split (r14's
      split_index cell split), ONE cold rebuild over the final corpus.
  /tmp/annwall_12m8_r14.jsonl
      — ask #1: the 12.8M fused rung re-measured AFTER the array-fold
      merge replaced the row-explosion ranking window (+ the ADVICE
      ANSI-packing and self-mask fixes). Done-criterion: the
      probe96+rerank6400 fused arm lands within ~1.5x of the probe128
      arm's cost_vs_brute_warm.
  /tmp/annwall_25m6_r14.jsonl
      — ask #2: the 25.6M rung that MEASURES the warm-brute-min
      crossover the r13 wall_statement extrapolated to ~25M
      (--fused-only: the reference arm's result is bit-parity-pinned
      by pytest and the r13 12.8M interleave; its wall doesn't fit the
      box budget at 25.6M).
  tools/logs_r14/stream_lifecycle.jsonl
      — ask #5: the end-to-end streaming session (serve -> ingest ->
      serve-under-ingest -> retrain UNDER LOAD -> blue/green swap with
      catch-up re-encode -> serve recovered -> completeness audit).

Everything else inherits from SCALE_r13 (fresh r13 measurements or
explicitly-pointed older anchors).

Usage: python tools/assemble_scale_r14.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R13 = json.load(open(os.path.join(REPO, "SCALE_r13.json")))


def jlines(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    for line in open(path, errors="replace"):
        line = line.strip().replace("\r", "")
        if "{" in line:
            cand = line[line.index("{"):]
            try:
                out.append(json.loads(cand))
            except json.JSONDecodeError:
                continue
    return out


def jobs_of(path: str) -> dict:
    jobs = {}
    for d in jlines(path):
        if "job" in d:
            jobs[d.pop("job")] = d
    return jobs


def inherited(section: str, why: str = "unchanged code path") -> dict:
    return {
        "inherited": (
            f"{why} — see SCALE_r13.json {section} (fresh r13 measurement "
            "or an explicit older anchor; round-14 budget went to the r13 "
            "verdict asks)"
        )
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SCALE_r14.json"
    )
    artifact: dict = {
        "note": (
            "Round-14 rungs: standalone fresh-process runs on an idle box "
            "(per-rung logs under tools/logs_r14/ and /tmp). Sections not "
            "listed here inherit SCALE_r13's fresh walls explicitly."
        )
    }

    # --- retrain_cycles (ask #3) ---
    rj = jobs_of(os.path.join(REPO, "tools/logs_r14/retrain_cycles.jsonl"))
    if rj:
        artifact["retrain_cycles"] = {
            "note": (
                "tools/scale_retrain_cycles_run.py --base 400000 --drift "
                "100000 --cycles 3 --queries 600 --cells 632 --probes 8,32 "
                "— the r13 verdict's multi-cycle schedule question. Arms "
                "walk the SAME 3-regime drift schedule: 'seeded' = serving "
                "centroids + new-regime sample (r12 recipe), 'seeded_split' "
                "= same + split_index (r14: oversized resident cells gain "
                "a bisecting seed at each warm retrain). ONE cold rebuild "
                "over the final 700k corpus is the reference point."
            ),
            "headline": (
                "Base-regime recall under seeded-warm does NOT decay "
                "monotonically — it dips once then stabilizes (0.8728 -> "
                "0.8636 -> 0.8636 across cycles, 1.65 pts under the final "
                "cold rebuild's 0.8801). With the r14 cell split the base "
                "gap closes to 0.79 pts (0.8722 held flat for all three "
                "cycles) AND every drift regime serves 1.4-1.9 pts ABOVE "
                "cold (c1/c2/c3 probe32: 0.9623/0.9629/0.9530 vs cold "
                "0.9464/0.9464/0.9338) — the split grows cells where mass "
                "arrives (1063 after 3 cycles vs cold's corpus-wide "
                "re-seed at 633). Documented schedule: pass the current "
                "index as split_index on every warm retrain; no periodic "
                "cold rebuild needed on the measured regimes."
            ),
            "jobs": rj,
        }
    else:
        artifact["retrain_cycles"] = {"missing": "rung log not found"}

    # --- ann: fused walls after the array-fold merge (asks #1, #2) ---
    ann: dict = {
        "note": (
            "Round-14 engine change under test: ivfpq_topk_fused's global "
            "row_number ranking window is REPLACED by per-(partition, "
            "query) array emission + a groupBy(q_id) applyInPandas merge "
            "(same (dist, n_id) order, same post-filter population — "
            "pytest bit-parity incl. wide codebooks and self-join "
            "queries); plus the ANSI-safe bit-op code packing and the "
            "in-fold self-pair mask (r13 ADVICE). The deep-shortlist "
            "configs are where the window term dominated."
        ),
        "frontier_inherited": (
            "recall/scan-bytes frontier (400k/1.6M/6.4M/12.8M) unchanged "
            "— deterministic, see SCALE_r11/r12 ann.*; r13 fusedwall_* "
            "walls are the pre-array-fold reference points"
        ),
    }
    for label, fname in (
        ("fusedwall_12m8_m16_arrayfold", "annwall_12m8_r14.jsonl"),
        ("fusedwall_25m6_m16", "annwall_25m6_r14.jsonl"),
    ):
        path = os.path.join(REPO, "tools/logs_r14", fname)
        if not os.path.exists(path):
            path = os.path.join("/tmp", fname)
        j = jobs_of(path)
        if not j:
            ann[label] = {"missing": f"{fname} not found or empty"}
            continue
        j.pop("tier_filter", None)
        ann[label] = {"jobs": j}
    ann["fusedwall_12m8_m16_arrayfold"]["caveat"] = (
        "The box roved WITHIN this one-shot rung (interleaved brute walls "
        "18.25/28.05/38.79 s; the UNCHANGED ivfpq_topk reference arm ran "
        "2.46x its r13 wall at probe96 and 0.88x at probe128), so its "
        "absolute cost_vs_brute_warm ratios are inflated and one-shot "
        "walls cannot adjudicate the array-fold. The interleaved "
        "same-session A/B below (ab_fused_merge_12m8) is the "
        "adjudication; this rung's value is recall/rows parity and the "
        "scan-bytes accounting, which are deterministic."
    )
    if "jobs" in ann.get("fusedwall_25m6_m16", {}):
        ann["fusedwall_25m6_m16"]["wall_statement"] = (
            "The r13 extrapolation ('min-denominator crossover at ~25M') "
            "is now MEASURED, and the honest answer is: not crossed at "
            "25.6M on this box. At the champion config "
            "(probe128+rerank3200 fused64, recall 0.8906, scanning "
            "0.175% of brute bytes) cost_vs_brute_warm_min continues its "
            "monotone fall 8.90 -> 3.63 -> 1.78 -> 1.37 across "
            "1.6M/6.4M/12.8M/25.6M, and the arm runs 0.75x of the SAME "
            "session's MEDIAN warm brute (98.2 s vs 130.2 s) — but the "
            "box's intra-session roving (brute warms 71.6/130.2 s, 1.8x; "
            "fused32 twins swinging both directions vs fused64) means a "
            "single-rep min-denominator ratio cannot resolve below "
            "~1.4x here. Committed as measured: crossed vs median, "
            "1.37x vs min, slope still bending."
        )
    abj = jobs_of(os.path.join(REPO, "tools/logs_r14/ab_fused_merge_12m8.jsonl"))
    if abj:
        artifact["ab_fused_merge"] = {
            "note": (
                "tools/ab_fused_merge.py — 12.8M-vector BoW fixture, the "
                "exact annwall recipe (cells 3578, assign-r 2, m 16, "
                "fused64). Interleaved window-vs-arrays reps in ONE "
                "session so box speed cancels; rows_equal asserts the "
                "two merge strategies return identical result sets."
            ),
            "headline": (
                "Ask #1 adjudicated: (a) the r13 deep-shortlist residual "
                "was dominated by box roving, not the merge strategy — "
                "interleaved, probe96+rerank6400 fused lands at 78.9-79.3 "
                "s vs probe128+rerank3200's 71.0-80.9 s, i.e. WITHIN "
                "1.12x (r13 verdict's done-bar: ~1.5x), and far under "
                "the one-shot 342.8 s recorded minutes earlier in the "
                "same process; (b) the array-fold merge is at PARITY "
                "with the row-explosion window on this box/N "
                "(arrays/window best-of-2: 1.005x at probe96_rerank6400, "
                "1.139x at probe128_rerank3200) — committed as the "
                "default for its structurally bounded shuffle (rows "
                "per (partition, query) = 1 array vs `shortlist` "
                "exploded rows), with merge='window' kept as an arm."
            ),
            "jobs": abj,
        }
    artifact["ann"] = ann

    # --- stream_lifecycle (ask #5) ---
    lj = jobs_of(os.path.join(REPO, "tools/logs_r14/stream_lifecycle.jsonl"))
    if lj:
        artifact["stream_lifecycle"] = {
            "note": (
                "tools/scale_stream_lifecycle_run.py — ONE continuous "
                "streaming session: serve base -> frozen-artifact ingest "
                "(native file-sink carrier) -> serve under ingest -> warm "
                "retrain UNDER LOAD (retrain thread concurrent with the "
                "live ingest query and a serving sample) -> blue/green "
                "swap (drain, catch-up re-encode of rows ingested past "
                "the retrain snapshot, restart on the same source "
                "checkpoint so nothing is double-encoded) -> serve "
                "recovered -> completeness audit (every corpus vec_id in "
                "exactly the new serving view, assign_r copies exact)."
            ),
            "headline": (
                "The operational loop holds together end-to-end at 400k "
                "base + 8x25k drift: ingest 12.5k ev/s through frozen "
                "artifacts; drift recall decays 0.614 -> 0.502 while "
                "base holds 0.866; the warm retrain runs 72.8 s "
                "CONCURRENT with live ingest and a serving sample "
                "(serving unaffected); swap catch-up re-encodes 100k "
                "in-flight rows in 3.2 s; recovered serving hits drift "
                "0.9285 / base 0.8722; the green stream ingests 25k "
                "more post-swap; audit 625000/625000 ids, 0 missing, "
                "exact assign_r copies. The run flushed out two real "
                "wiring hazards (sink-log shadowing of batch-written "
                "carrier rows; checkpoint/sink pairing across the "
                "blue/green swap) — fixed via batch+stream union view "
                "and source-prefix rotation, see the runner docstring."
            ),
            "jobs": lj,
        }
    else:
        artifact["stream_lifecycle"] = {"missing": "rung log not found"}

    # --- inherited sections (all fresh in r13) ---
    for sec in (
        "corpus", "corpus_zipf", "skew", "bpe", "cc_distributed",
        "stateful", "retrieval_maxscore", "market", "stream_retrain",
        "stream_verify",
    ):
        if sec in R13:
            artifact[sec] = inherited(sec)

    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
