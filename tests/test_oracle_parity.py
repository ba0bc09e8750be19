"""Run every suite query at sf0.01 against its DuckDB oracle — the
local mirror of the driver's CORRECTNESS gate."""

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle_utils import assert_frames_match

from city_payroll_data_pipeline_spark.suite import build_suite

# built ONCE: each parametrized case reads this instead of re-running
# the 7-module registry merge per query
_SUITE = build_suite()


@pytest.mark.parametrize("name", sorted(_SUITE.keys()))
def test_query_matches_oracle(name, spark, duck):
    q = _SUITE[name]
    sdf = q.spark(spark, SF_CORRECT).toPandas()
    if q.oracle is None:
        # rows-only: the declared no-oracle queries all produce a
        # non-empty, non-degenerate frame (a >= 0 assert is a
        # tautology that validates nothing)
        assert len(sdf) > 0 and len(sdf.columns) > 0, (
            name, sdf.shape)
        return
    odf = duck.execute(q.oracle).fetchdf()
    assert_frames_match(sdf, odf, name)
