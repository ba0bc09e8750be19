"""Education (NJ teacher salaries) staging + fact transforms.

Semantics mirror reference models/education/stg_education.sql and
models/education/fct_corporate.sql (file misnamed upstream; the model
inside is ``education.fct_education``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.functions.cleaning import processed_at_column


def stg_education(raw: DataFrame, processed_at=None) -> DataFrame:
    """Staging: rename, cast numerics, default fte→1.0 / experience→0.0 /
    salary→0.0 (stg_education.sql:8-31)."""
    return raw.select(
        F.col("last_name"),
        F.col("first_name"),
        F.col("district").alias("district_name"),
        F.col("school").alias("school_name"),
        F.col("primary_job").alias("job_title"),
        F.coalesce(F.col("fte").try_cast("double"), F.lit(1.0)).alias("fte_ratio"),
        F.coalesce(F.col("experience_total").try_cast("double"), F.lit(0.0)).alias(
            "experience_years"
        ),
        F.col("certificate").alias("certificate_status"),
        F.coalesce(F.col("salary").try_cast("double"), F.lit(0.0)).alias("base_salary"),
        processed_at_column(processed_at).alias("processed_at"),
    )


def seniority_bonus() -> Column:
    """5% bonus for >15 years experience (fct, strict >, lines 27-30)."""
    return F.when(
        F.col("experience_years") > 15, F.col("base_salary") * 0.05
    ).otherwise(F.lit(0.0))


def fct_education(stg: DataFrame) -> DataFrame:
    """Fact: employment status, seniority bonus, total cost, efficiency
    ratio (models/education/fct_corporate.sql:6-41)."""
    return stg.select(
        "district_name",
        "school_name",
        "job_title",
        "base_salary",
        "fte_ratio",
        "experience_years",
        F.when(F.col("fte_ratio") >= 1.0, "Full Time")
        .otherwise("Part Time / Adjunct")
        .alias("employment_status"),
        seniority_bonus().alias("seniority_bonus"),
        (F.col("base_salary") + seniority_bonus()).alias("total_amount"),
        F.round(
            F.col("base_salary")
            / F.when(F.col("experience_years") != 0, F.col("experience_years")),
            2,
        ).alias("cost_per_experience_year"),
        "processed_at",
    )
