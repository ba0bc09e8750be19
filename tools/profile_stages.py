#!/usr/bin/env python
"""Per-stage cost breakdown for named suite queries (event-log based).

Usage: python tools/profile_stages.py <query> [<query> ...]

Runs each query once (noop sink) in a fresh session with the Spark
event log enabled, then reads SparkListenerStageCompleted events back:
per stage — executor run time, shuffle read/write bytes, input bytes,
task count, and the first line of the stage's callsite. This is the
local stand-in for the Spark UI's stage table (the UI is disabled in
this sandbox) and the evidence VERDICT r10 item 5 asks for: WHERE a
slow query's time actually goes, not just its total.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        sys.stderr.write("usage: python tools/profile_stages.py <query> ...\n")
        sys.exit(2)
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from city_payroll_data_pipeline_spark.suite import build_suite

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("profile_stages")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    suite = build_suite()

    spans = {}
    for name in names:
        # warmup run so codegen/file-listing one-offs don't pollute the
        # profiled pass (matches the bench's best-of-2 methodology)
        suite[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t0 = time.time() * 1000
        suite[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spans[name] = (t0, time.time() * 1000)
    spark.stop()

    # Spark 4 writes rolling event logs as a directory
    # (eventlog_v2_<app>/events_*); accept both layouts
    ev_files = [
        p
        for p in glob.glob(f"{evdir}/*") + glob.glob(f"{evdir}/*/*")
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    stages = []
    for path in ev_files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerStageCompleted":
                    continue
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                if sub is None:
                    continue
                stages.append(si)

    for name, (t0, t1) in spans.items():
        mine = [
            s for s in stages if t0 <= s["Submission Time"] <= t1
        ]
        rows = []
        for s in mine:
            acc = {
                a["Name"]: a.get("Value")
                for a in s.get("Accumulables", [])
            }
            rows.append(
                {
                    "stage": s["Stage ID"],
                    "tasks": s["Number of Tasks"],
                    "wall_ms": (s.get("Completion Time") or 0)
                    - s["Submission Time"],
                    "run_ms": acc.get("internal.metrics.executorRunTime", 0),
                    "shuf_r_mb": round(
                        (acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                         + acc.get("internal.metrics.shuffle.read.localBytesRead", 0))
                        / 1e6, 2),
                    "shuf_w_mb": round(
                        acc.get("internal.metrics.shuffle.write.bytesWritten", 0)
                        / 1e6, 2),
                    "input_mb": round(
                        acc.get("internal.metrics.input.bytesRead", 0) / 1e6, 2
                    ),
                    "site": s.get("Details", "").split("\n")[0][:100],
                    "name": s.get("Stage Name", "")[:60],
                }
            )
        rows.sort(key=lambda r: -r["wall_ms"])
        print(f"== {name}: {len(mine)} stages, "
              f"wall {round((t1 - t0) / 1000, 2)} s")
        for r in rows[:12]:
            print(
                f"  stage {r['stage']:>5} wall {r['wall_ms']:>6} ms "
                f"run {r['run_ms']:>7} ms tasks {r['tasks']:>3} "
                f"shufR {r['shuf_r_mb']:>7} MB shufW {r['shuf_w_mb']:>7} MB "
                f"in {r['input_mb']:>7} MB  {r['name']}"
            )


if __name__ == "__main__":
    main()
