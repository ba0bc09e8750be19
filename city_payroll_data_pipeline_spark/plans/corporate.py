"""Corporate (LA City payroll) staging + fact transforms.

Semantics mirror reference models/corporate/stg_corporate.sql and
models/corporate/fct_corporate.sql, re-expressed as declarative
DataFrame plans (whole-stage-codegen'd column expressions; no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.functions.cleaning import (
    money_to_double,
    processed_at_column,
)


def stg_corporate(raw: DataFrame, processed_at=None) -> DataFrame:
    """Staging: rename quoted headers, strip currency symbols, cast,
    zero-fill nullable money columns, stamp audit timestamp.

    Parity: stg_corporate.sql:13-34 (project/rename P1, regex strip F1,
    double cast F2, COALESCE zero-fill F4, CURRENT_TIMESTAMP F14).

    ``processed_at``: optional frozen timestamp literal (ISO string or
    datetime) so tests/golden hashes are deterministic; defaults to
    ``current_timestamp()`` like the reference.
    """
    return raw.select(
        F.col("`Row ID`").alias("row_id"),
        F.col("`Year`").alias("year"),
        F.col("`Department Title`").alias("department"),
        F.col("`Job Class Title`").alias("job_title"),
        F.col("`Employment Type`").alias("employment_type"),
        money_to_double(F.col("`Base Pay`")).alias("base_pay"),
        F.coalesce(money_to_double(F.col("`Overtime Pay`")), F.lit(0.0)).alias(
            "overtime_pay"
        ),
        F.coalesce(
            money_to_double(F.col("`Longevity Bonus Pay`")), F.lit(0.0)
        ).alias("longevity_bonus"),
        F.coalesce(
            money_to_double(F.col("`Average Benefit Cost`")), F.lit(0.0)
        ).alias("benefit_cost"),
        processed_at_column(processed_at).alias("processed_at"),
    )


def total_amount_corporate() -> Column:
    """Total cost to organization (fct_corporate.sql:20)."""
    return (
        F.col("base_pay")
        + F.col("overtime_pay")
        + F.col("longevity_bonus")
        + F.col("benefit_cost")
    )


def overtime_status() -> Column:
    """Overtime risk categorization (fct_corporate.sql:25-29, strict >)."""
    return (
        F.when(F.col("overtime_pay") > 0.25 * F.col("base_pay"), "High Overtime")
        .when(F.col("overtime_pay") > 0, "Regular Overtime")
        .otherwise("No Overtime")
    )


def loyalty_bonus_percentage() -> Column:
    """Loyalty-bonus ratio % with div-by-zero guard (fct_corporate.sql:34)."""
    return F.round(
        F.col("longevity_bonus")
        / F.when(F.col("base_pay") != 0, F.col("base_pay"))
        * 100,
        2,
    )


def fct_corporate(stg: DataFrame) -> DataFrame:
    """Fact: TCO, overtime risk flag, loyalty ratio (fct_corporate.sql:6-37)."""
    return stg.select(
        "row_id",
        "year",
        "department",
        "job_title",
        "base_pay",
        "overtime_pay",
        total_amount_corporate().alias("total_amount"),
        overtime_status().alias("overtime_status"),
        loyalty_bonus_percentage().alias("loyalty_bonus_percentage"),
        "processed_at",
    )
