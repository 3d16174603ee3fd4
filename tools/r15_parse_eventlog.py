"""Parse a Spark v2 event-log dir (zstd) into per-query stage breakdowns.

Companion to tools/r15_profile.py: attributes stages to queries via the
job-group label ``<query>|rep1`` and prints, per query, the top stages by
summed executor run time with shuffle read/write bytes. Offline — no Spark.

Usage: python tools/r15_parse_eventlog.py /tmp/spark-events-r15/<app_dir>
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys


def iter_events(app_dir: str):
    for path in sorted(glob.glob(os.path.join(app_dir, "events_*"))):
        if path.endswith(".zstd"):
            proc = subprocess.Popen(
                ["zstd", "-dc", path], stdout=subprocess.PIPE, text=True
            )
            for line in proc.stdout:
                yield json.loads(line)
            proc.wait()
        else:
            with open(path) as fh:
                for line in fh:
                    yield json.loads(line)


def main() -> None:
    app_dir = sys.argv[1]
    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    for ev in iter_events(app_dir):
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "group": props.get("spark.jobGroup.id", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            d = stage_info.setdefault(si["Stage ID"], {
                "name": "?", "ntasks": 0, "wall_ms": 0, "run_ms": 0,
                "sh_read": 0, "sh_write": 0, "input": 0, "cpu_ms": 0,
            })
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            d["name"] = si.get("Stage Name", "")[:100]
            d["ntasks"] = si.get("Number of Tasks", 0)
            d["wall_ms"] = (comp - sub) if sub and comp else 0
        elif e == "SparkListenerTaskEnd":
            d = stage_info.setdefault(ev["Stage ID"], {
                "name": "?", "ntasks": 0, "wall_ms": 0, "run_ms": 0,
                "sh_read": 0, "sh_write": 0, "input": 0, "cpu_ms": 0,
            })
            m = ev.get("Task Metrics") or {}
            d["run_ms"] += m.get("Executor Run Time", 0)
            d["cpu_ms"] += (m.get("Executor CPU Time", 0)) // 1_000_000
            sr = m.get("Shuffle Read Metrics") or {}
            d["sh_read"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            d["sh_write"] += sw.get("Shuffle Bytes Written", 0)
            inp = m.get("Input Metrics") or {}
            d["input"] += inp.get("Bytes Read", 0)

    per_query: dict[str, dict] = {}
    for jid, j in sorted(jobs.items()):
        grp = j["group"]
        if "|rep1" not in grp:
            continue
        qname = grp.split("|")[0]
        agg = per_query.setdefault(qname, {"sids": set(), "run_ms": 0, "sh": 0})
        for sid in j["stages"]:
            if sid in agg["sids"] or sid not in stage_info:
                continue
            agg["sids"].add(sid)
            agg["run_ms"] += stage_info[sid]["run_ms"]
            agg["sh"] += stage_info[sid]["sh_write"]

    for qname, agg in sorted(per_query.items(), key=lambda kv: -kv[1]["run_ms"]):
        print(f"\n== {qname}: {len(agg['sids'])} stages, "
              f"task-run {agg['run_ms']}ms, shuffleW {agg['sh']//1024}KiB")
        top = sorted(agg["sids"], key=lambda s: -stage_info[s]["run_ms"])[:7]
        for sid in top:
            d = stage_info[sid]
            print(f"   stage {sid:4d} run={d['run_ms']:6d}ms cpu={d['cpu_ms']:6d}ms "
                  f"wall={d['wall_ms']:6d}ms tasks={d['ntasks']:3d} "
                  f"shR={d['sh_read']//1024:6d}K shW={d['sh_write']//1024:6d}K "
                  f"in={d['input']//1024:7d}K {d['name'][:55]}")


if __name__ == "__main__":
    main()
