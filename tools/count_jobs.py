#!/usr/bin/env python
"""Count Spark jobs per named suite query (fresh session, noop sink).

Usage: python tools/count_jobs.py <query> [<query> ...]

Job count is the hard evidence for job-cadence optimizations (lazy
checkpoint fusion, fused convergence counts): the pre-execution plan
does not show per-round actions, but the status tracker does. Each
query is built AND executed once; the delta in tracked job ids is its
job count (build-time collects/checkpoints included — they are part of
what the bench times).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        sys.stderr.write("usage: python tools/count_jobs.py <query> ...\n")
        sys.exit(2)
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from city_payroll_data_pipeline_spark.session import get_spark
    from city_payroll_data_pipeline_spark.suite import build_suite

    spark = get_spark(app_name="count_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    suite = build_suite()
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        before = len(tracker.getJobIdsForGroup(None))
        suite[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = len(tracker.getJobIdsForGroup(None)) - before
    print(json.dumps({"mode": "jobs", "results": out}))


if __name__ == "__main__":
    main()
