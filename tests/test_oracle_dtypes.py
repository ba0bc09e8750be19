"""Suite-wide dtype-KIND check at sf0.001 — cheap early warning for the
driver's type-sensitive value hash.

Runs every oracle pair at the smallest scale factor and compares only
the numeric kind (integer vs floating vs datetime vs bool) of each
column between the Spark result and the DuckDB oracle result. Values
are NOT compared here (test_oracle_parity does that at sf0.01); this
exists because dtype drift is scale-independent, so sf0.001 catches it
in seconds — including drift introduced by the driver regenerating the
testdata parquet between rounds (round 2: events.ts nanos→micros).
"""

import duckdb
import pytest

from tests.conftest import SF_SMOKE, TABLES
from tests.oracle_utils import (
    assert_dtype_kinds_match,
    pooled_spark_frames,
    selected_param_names,
)


def _suite():
    from city_payroll_data_pipeline_spark.suite import build_suite

    return build_suite()


@pytest.fixture(scope="module")
def duck_smoke():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def dtype_frames(request, spark):
    """The selected oracled queries' Spark results at sf0.001, computed
    concurrently on the shared session (same rationale and helper as
    test_oracle_parity.parity_frames — the serial sweep was the other
    half of the pytest wall-time that outgrew the driver's budget)."""
    suite = _suite()
    oracled = [n for n in sorted(suite) if suite[n].oracle is not None]
    names = [
        n
        for n in selected_param_names(
            request, "test_dtype_kinds_match_oracle", oracled
        )
        if suite[n].oracle is not None
    ]
    return pooled_spark_frames(suite, spark, SF_SMOKE, names)


@pytest.mark.parametrize("name", sorted(_suite().keys()))
def test_dtype_kinds_match_oracle(name, spark, duck_smoke, dtype_frames):
    q = _suite()[name]
    if q.oracle is None:
        pytest.skip("no oracle (rows-only driver check)")
    sdf, exc = dtype_frames[name]
    if exc is not None:
        raise exc
    odf = duck_smoke.execute(q.oracle).fetchdf()
    assert_dtype_kinds_match(sdf, odf, name)
