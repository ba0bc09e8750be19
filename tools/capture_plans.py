#!/usr/bin/env python
"""Capture .explain("formatted") output for named suite queries.

Usage: python tools/capture_plans.py <suffix> <query> [<query> ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (round dir
defaults to r11) for each query. Building a query DataFrame may run its
driver-side training collects (train_bpe, greedy_max_coverage); that is
part of plan construction, not a timing measurement, so this tool is
safe to run on a loaded host.

Comparability contract (VERDICT r10 item 8): every capture uses the
same explain mode ("formatted"), the same fresh-session state (one
SparkSession per invocation, default AQE config from get_spark), and
captures the pre-execution plan (AdaptiveSparkPlan isFinalPlan=false) —
so Exchange/Join node counts of a before/after pair grep comparably.
Run one invocation per suffix; never mix suffixes in a session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        sys.stderr.write(
            "usage: python tools/capture_plans.py <suffix> <query> "
            "[<query> ...]\n"
        )
        sys.exit(2)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from city_payroll_data_pipeline_spark.session import get_spark
    from city_payroll_data_pipeline_spark.suite import build_suite

    spark = get_spark(app_name=f"capture_plans_{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    suite = build_suite()
    for name in names:
        df = suite[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
