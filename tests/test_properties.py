"""Property-based tests (hypothesis) for the cleaning expressions —
the paths where a single malformed row at 100 TB must degrade to NULL,
never kill the job or silently shift a value."""

from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.functions.cleaning import (
    money_to_double,
    nullif_zero,
    zero_fill,
)


def _parse(spark, raw: list[str | None]) -> list:
    df = spark.createDataFrame([(v,) for v in raw], schema="raw string")
    return [r["v"] for r in df.select(money_to_double(F.col("raw")).alias("v")).collect()]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=Decimal("-10000000"),
            max_value=Decimal("10000000"),
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
    st.booleans(),
)
def test_money_parse_roundtrip(spark, values, dollar_sign, commas):
    """Any $-and-comma formatted 2dp decimal parses back to its exact
    value (2dp decimals are exactly representable paths through the
    double parse used here)."""
    raw = []
    for v in values:
        s = f"{v:,.2f}" if commas else f"{v:.2f}"
        if dollar_sign:
            s = ("-" if s.startswith("-") else "") + "$" + s.lstrip("-")
        raw.append(s)
    parsed = _parse(spark, raw)
    assert parsed == [pytest.approx(float(v), abs=0) for v in values]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=6))
def test_money_parse_never_raises(spark, garbage):
    """Arbitrary junk strings parse to NULL or a float — never an
    exception (try_cast holds even with session ANSI mode ON)."""
    parsed = _parse(spark, garbage)
    assert all(p is None or isinstance(p, float) for p in parsed)


def test_guard_composition(spark):
    """zero_fill(nullif_zero(x)) — the reference's divide guard +
    default policy: 0 → NULL → default; NULL → default; else passthrough."""
    df = spark.createDataFrame([(0.0,), (None,), (2.5,)], schema="x double")
    out = [
        r["y"]
        for r in df.select(
            zero_fill(nullif_zero(F.col("x")), 9.0).alias("y")
        ).collect()
    ]
    assert out == [9.0, 9.0, 2.5]
