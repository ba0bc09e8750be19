"""Run every suite query at sf0.01 against its DuckDB oracle — the
local mirror of the driver's CORRECTNESS gate."""

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle_utils import assert_frames_match


def _suite():
    from city_payroll_data_pipeline_spark.suite import build_suite

    return build_suite()


@pytest.mark.parametrize("name", sorted(_suite().keys()))
def test_query_matches_oracle(name, spark, duck):
    q = _suite()[name]
    sdf = q.spark(spark, SF_CORRECT).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check, mirrors driver behavior
        return
    odf = duck.execute(q.oracle).fetchdf()
    assert_frames_match(sdf, odf, name)
