"""Run every suite query at sf0.01 against its DuckDB oracle — the
local mirror of the driver's CORRECTNESS gate."""

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle_utils import (
    assert_frames_match,
    pooled_spark_frames,
    selected_param_names,
)

from city_payroll_data_pipeline_spark.suite import build_suite

# built ONCE: each parametrized case reads this instead of re-running
# the 7-module registry merge per query
_SUITE = build_suite()


@pytest.fixture(scope="module")
def parity_frames(request, spark):
    """The SELECTED queries' Spark results, computed 8-at-a-time on the
    shared session (oracle_utils.pooled_spark_frames): the sweep was
    wall-time-bound on serial job submission (~1 s/query of analysis +
    tiny stages), which made the full suite outgrow the driver's pytest
    budget (VERDICT r10 item 1). Each test below still owns its
    assertion and its failure; targeted runs precompute only their own
    queries."""
    names = selected_param_names(
        request, "test_query_matches_oracle", sorted(_SUITE)
    )
    return pooled_spark_frames(_SUITE, spark, SF_CORRECT, names)


@pytest.mark.parametrize("name", sorted(_SUITE.keys()))
def test_query_matches_oracle(name, spark, duck, parity_frames):
    q = _SUITE[name]
    sdf, exc = parity_frames[name]
    if exc is not None:
        raise exc
    if q.oracle is None:
        # rows-only: the declared no-oracle queries all produce a
        # non-empty, non-degenerate frame (a >= 0 assert is a
        # tautology that validates nothing)
        assert len(sdf) > 0 and len(sdf.columns) > 0, (
            name, sdf.shape)
        return
    odf = duck.execute(q.oracle).fetchdf()
    assert_frames_match(sdf, odf, name)
