"""Round-15 profiling harness: per-query stage breakdown via the event log.

Runs each headline batch query twice (rep 2 timed — rep 1 warms codegen and
the OS page cache), labels jobs with the query name, and parses the Spark
event log into per-query totals: wall, per-stage executor run time, shuffle
bytes, task counts. Guide §1 (measure first) — this tells us which stage of
which query to optimize, which `.explain` alone cannot.

Usage: python tools/r15_profile.py [query ...]   (default: the full batch set)
Output: /tmp/r15_profile.json + a sorted text report on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-r15"


def main() -> None:
    import shutil

    os.makedirs(EVDIR, exist_ok=True)
    for f in os.listdir(EVDIR):
        p = os.path.join(EVDIR, f)
        shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)

    from crypto_market_data_etl_spark.session import get_spark

    spark = get_spark(
        app_name="r15_profile",
        extra_confs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
        },
    )
    from crypto_market_data_etl_spark import plans
    from crypto_market_data_etl_spark.schemas import TESTDATA_TABLES, load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()

    qs = plans.all_queries()
    qs.update(plans.variant_queries())
    names = sys.argv[1:] or [
        "q01_pricing_summary", "q02_revenue_by_nation", "q04_candles_tumbling",
        "q05_sliding_stats", "q24_sliding_paned", "q08_dollar_bars",
        "q09_flagship", "q29_asof_adaptive", "q30_stream_dollar_bars",
        "q11_ewma", "x02_minhash_pairs", "x05_embedding_topk",
        "x06_lsh_buckets", "x10_fingerprint", "x21_dup_clusters",
        "x22_contamination", "x24_shard_packing", "x26_bloom_contamination",
        "x28_chunk_dedup", "x32_semantic_dedup", "x34_domain_mixture",
        "x36_ngram_lm", "x37_bm25_topk", "x38_cross_corpus_neardup",
        "x39_dsir_weights", "x41_span_dedup", "x48_multimodal_decode",
    ]

    def hygiene() -> None:
        for tbl in spark.catalog.listTables():
            if tbl.tableType == "TEMPORARY":
                spark.catalog.dropTempView(tbl.name)
        spark.catalog.clearCache()

    walls: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        walls[name] = []
        for rep in range(2):
            spark.sparkContext.setJobGroup(f"{name}|rep{rep}", name)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            walls[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobGroup("", "")
            hygiene()
        print(f"# {name}: {walls[name]}", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log ----
    # Spark 4 writes a rolling v2 layout (eventlog_v2_<appId>/events_*.zstd)
    # rather than a single <appId> file — iterate whichever exists (the
    # session crashed here on the v2 dir until r15 batch 7's session)
    def _iter_event_lines():
        flat = os.path.join(EVDIR, app_id)
        v2 = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        if os.path.isfile(flat):
            with open(flat) as fh:
                yield from fh
            return
        import glob
        import subprocess

        for path in sorted(glob.glob(os.path.join(v2, "events_*"))):
            if path.endswith(".zstd"):
                proc = subprocess.Popen(
                    ["zstd", "-dc", path], stdout=subprocess.PIPE, text=True
                )
                yield from proc.stdout
                proc.wait()
            else:
                with open(path) as fh:
                    yield from fh

    jobs: dict[int, dict] = {}          # jobId -> {group, stages:[ids]}
    stage_info: dict[tuple, dict] = {}  # (stageId, attempt) -> metrics
    for line in _iter_event_lines():
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            grp = props.get("spark.jobGroup.id", "")
            jobs[ev["Job ID"]] = {
                "group": grp,
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = (si["Stage ID"], si["Stage Attempt ID"])
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            # update in place: TaskEnd events for this stage have already
            # accumulated run/cpu/shuffle totals — a dict REPLACEMENT here
            # zeroed them (the standalone r15_parse_eventlog.py always
            # updated in place; this inline copy diverged)
            d = stage_info.setdefault(sid, {
                "name": "?", "ntasks": 0, "wall_ms": 0, "run_ms": 0,
                "sh_read": 0, "sh_write": 0, "input": 0, "cpu_ms": 0,
            })
            d["name"] = si.get("Stage Name", "")[:90]
            d["ntasks"] = si.get("Number of Tasks", 0)
            d["wall_ms"] = (comp - sub) if sub and comp else 0
        elif e == "SparkListenerTaskEnd":
            si = (ev["Stage ID"], ev["Stage Attempt ID"])
            m = ev.get("Task Metrics") or {}
            d = stage_info.setdefault(si, {
                "name": "?", "ntasks": 0, "wall_ms": 0, "run_ms": 0,
                "sh_read": 0, "sh_write": 0, "input": 0, "cpu_ms": 0,
            })
            d["run_ms"] += m.get("Executor Run Time", 0)
            d["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
            sr = m.get("Shuffle Read Metrics") or {}
            d["sh_read"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            d["sh_write"] += sw.get("Shuffle Bytes Written", 0)
            inp = m.get("Input Metrics") or {}
            d["input"] += inp.get("Bytes Read", 0)

    # attribute stages to query name via job group "name|repN" (rep1 only)
    per_query: dict[str, dict] = {}
    for jid, j in sorted(jobs.items()):
        grp = j["group"]
        if "|rep1" not in grp:
            continue
        qname = grp.split("|")[0]
        agg = per_query.setdefault(qname, {"stages": [], "run_ms": 0, "sh": 0})
        for sid in j["stages"]:
            for (s, a), d in stage_info.items():
                if s == sid:
                    agg["stages"].append((sid, d))
                    agg["run_ms"] += d["run_ms"]
                    agg["sh"] += d["sh_write"]

    out = {}
    for qname in names:
        agg = per_query.get(qname, {"stages": [], "run_ms": 0, "sh": 0})
        top = sorted(agg["stages"], key=lambda t: -t[1]["run_ms"])[:6]
        out[qname] = {
            "wall_rep0": walls[qname][0], "wall_rep1": walls[qname][1],
            "n_stages": len(agg["stages"]),
            "sum_task_run_ms": agg["run_ms"],
            "shuffle_write_bytes": agg["sh"],
            "top_stages": [
                {"id": sid, "run_ms": d["run_ms"], "cpu_ms": d["cpu_ms"],
                 "wall_ms": d["wall_ms"], "ntasks": d["ntasks"],
                 "sh_read": d["sh_read"], "sh_write": d["sh_write"],
                 "name": d["name"]}
                for sid, d in top
            ],
        }
    with open("/tmp/r15_profile.json", "w") as fh:
        json.dump(out, fh, indent=1)

    for qname in sorted(out, key=lambda q: -out[q]["wall_rep1"]):
        o = out[qname]
        print(f"\n== {qname}: wall {o['wall_rep0']}/{o['wall_rep1']}s, "
              f"{o['n_stages']} stages, task-run {o['sum_task_run_ms']}ms, "
              f"shuffle {o['shuffle_write_bytes']//1024}KiB")
        for s in o["top_stages"]:
            print(f"   stage {s['id']:4d} run={s['run_ms']:6d}ms cpu={s['cpu_ms']:6d}ms "
                  f"wall={s['wall_ms']:6d}ms tasks={s['ntasks']:3d} "
                  f"shR={s['sh_read']//1024:6d}K shW={s['sh_write']//1024:6d}K {s['name'][:60]}")


if __name__ == "__main__":
    main()
