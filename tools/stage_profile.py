#!/usr/bin/env python3
"""Per-stage wall-clock attribution for one or more declared queries.

Usage: python tools/stage_profile.py <query> [<query> ...]

Runs each query once untimed (codegen warm) then once timed with the
Spark event log enabled, and prints per-stage duration / task count /
task-time sum, attributing wall-clock to individual stages.  Reads
$SPARK_GRAFT_SF_DIR (default sf0.1) and $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hauser_spark.session import build_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="spark-ev-")
    import __spark_entry__ as entrymod

    spark = build_session(
        app_name="stage_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    marks = {}
    for name in names:
        # untimed warm run
        qs[name](spark, sf_dir).collect()
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"TIMED:{name}")
        rows = qs[name](spark, sf_dir).collect()
        spark.sparkContext.setJobDescription(None)
        t1 = time.time()
        marks[name] = (t0, t1, t1 - t0, len(rows))
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4 rolls logs under eventlog_v2_<appId>/)
    evfile = os.path.join(evdir, app_id)
    if not os.path.exists(evfile):
        d2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        if os.path.isdir(d2):
            cands = [
                os.path.join(d2, f)
                for f in os.listdir(d2)
                if f.startswith("events_")
            ]
            evfile = sorted(cands)[0] if cands else d2
        else:
            evfile = d2
    stages = {}  # (stageId, attempt) -> dict
    jobs = {}  # jobId -> (desc, submit_ms)
    stage_to_job = {}
    with open(evfile) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = (desc, ev.get("Submission Time", 0))
                for si in ev.get("Stage IDs", []):
                    stage_to_job[si] = jid
            elif e == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                sid = info["Stage ID"]
                sub = info.get("Submission Time")
                comp = info.get("Completion Time")
                if sub is None or comp is None:
                    continue
                stages[(sid, info["Stage Attempt ID"])] = {
                    "name": info["Stage Name"],
                    "dur_ms": comp - sub,
                    "sub": sub,
                    "n_tasks": info["Number of Tasks"],
                    "job": stage_to_job.get(sid),
                }

    for name in names:
        t0, t1, wall, nrows = marks[name]
        print(f"\n=== {name}: wall {wall:.3f}s, {nrows} rows ===")
        t0ms, t1ms = t0 * 1000, t1 * 1000
        rel = [
            s
            for s in stages.values()
            if s["sub"] >= t0ms - 50 and s["sub"] <= t1ms + 50
        ]
        rel.sort(key=lambda s: s["sub"])
        tot = sum(s["dur_ms"] for s in rel)
        print(
            f"  {len(rel)} stages, sum(stage dur) {tot / 1000:.3f}s "
            f"(gaps/driver: {wall - tot / 1000:.3f}s)"
        )
        for s in rel:
            if s["dur_ms"] < 10:
                continue
            print(
                f"  {s['dur_ms']:>6} ms  {s['n_tasks']:>4} tasks  "
                f"+{(s['sub'] - t0ms) / 1000:7.3f}s  {s['name'][:90]}"
            )


if __name__ == "__main__":
    main()
