"""Every suite query must execute at sf0.001 (tiny data): guards the
degenerate regimes — documents shorter than a shingle, empty LSH
buckets, single-row groups — that only show up below oracle scale."""

import pytest

from tests.conftest import SF_SMOKE


def _suite():
    from city_payroll_data_pipeline_spark.suite import build_suite

    return build_suite()


@pytest.mark.parametrize("name", sorted(_suite().keys()))
def test_query_runs_at_tiny_scale(name, spark):
    df = _suite()[name].spark(spark, SF_SMOKE)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_bench_emits_one_json_line():
    """The driver parses bench.py's stdout as ONE JSON line with
    metric/value/unit/queries/sf — a format break would void the
    round's BENCH record."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_SMOKE)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600, check=True,
    ).stdout.strip().splitlines()
    payload = json.loads(out[-1])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in payload, payload
    assert payload["unit"] == "sec" and payload["value"] > 0
    assert len(payload["queries"]) >= 25
    assert not payload.get("errors"), payload.get("errors")
