#!/usr/bin/env python
"""Capture .explain("formatted") output for named suite queries.

Usage: python tools/capture_plans.py <suffix> <query> [<query> ...]
Writes plans/r10/<query>_<suffix>.txt for each query. Building a query
DataFrame may run its driver-side training collects (train_bpe,
greedy_max_coverage); that is part of plan construction, not a timing
measurement, so this tool is safe to run on a loaded host.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r10",
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
