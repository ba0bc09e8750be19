"""Hospital (Medicare inpatient charges) staging + fact transforms.

Semantics mirror reference models/hospital/stg_hospital.sql and
models/hospital/fct_hospital.sql. The raw CSV headers are messy
(leading/trailing spaces) and are normalized DuckDB-style by the
source layer (see schemas.normalize_columns) before this plan runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.functions.cleaning import processed_at_column


def stg_hospital(raw: DataFrame, processed_at=None) -> DataFrame:
    """Staging over normalized headers (stg_hospital.sql:13-22):
    rename, int/double casts, audit timestamp.

    Expects columns already normalized (provider_name, provider_city,
    provider_state, drg_definition, total_discharges,
    average_total_payments, average_medicare_payments).
    """
    return raw.select(
        F.col("provider_name").alias("hospital_name"),
        F.col("provider_city").alias("city"),
        F.col("provider_state").alias("state"),
        F.col("drg_definition").alias("service_description"),
        F.col("total_discharges").try_cast("int").alias("total_patients"),
        F.col("average_total_payments").try_cast("double").alias(
            "avg_payment_per_patient"
        ),
        F.col("average_medicare_payments").try_cast("double").alias("medicare_coverage"),
        processed_at_column(processed_at).alias("processed_at"),
    )


def fct_hospital(stg: DataFrame) -> DataFrame:
    """Fact: service_description exposed as job_title per the
    cross-industry contract; total_amount = patients × avg payment
    (fct_hospital.sql:6-17)."""
    return stg.select(
        "hospital_name",
        F.col("service_description").alias("job_title"),
        "city",
        "state",
        "total_patients",
        "avg_payment_per_patient",
        (F.col("total_patients") * F.col("avg_payment_per_patient")).alias(
            "total_amount"
        ),
        "processed_at",
    )
