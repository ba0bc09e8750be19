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
