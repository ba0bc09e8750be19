"""Schema contracts and header normalization.

The reference reads every raw CSV column as a string
(``all_varchar=True``, reference models/corporate/stg_corporate.sql:40-45)
and staging models cast explicitly; we mirror that with explicit
all-string input schemas (never ``inferSchema`` — inference is a full
extra pass over 100 TB of input and produces unstable types).

The cross-industry output contract — every fact table exposes
``job_title: string`` and ``total_amount: double`` — is hard-coded in
the reference server (serve_flight.py:285-286); here it is an explicit,
validated contract.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Raw input headers per industry (FIXTURES.md §1; reference stg models)
# --------------------------------------------------------------------------

CORPORATE_RAW_COLUMNS = [
    "Row ID",
    "Year",
    "Department Title",
    "Job Class Title",
    "Employment Type",
    "Base Pay",
    "Overtime Pay",
    "Longevity Bonus Pay",
    "Average Benefit Cost",
]

EDUCATION_RAW_COLUMNS = [
    "last_name",
    "first_name",
    "district",
    "school",
    "primary_job",
    "fte",
    "experience_total",
    "certificate",
    "salary",
]

HOSPITAL_RAW_COLUMNS = [
    "Provider Name",
    "Provider City",
    "Provider State",
    "DRG Definition",
    " Total Discharges ",
    " Average Total Payments ",
    " Average Medicare Payments ",
]

INDUSTRIES = ("corporate", "education", "hospital")


def all_string_schema(columns: list[str]) -> T.StructType:
    """All-varchar schema-on-read (reference stg_corporate.sql:44)."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


# --------------------------------------------------------------------------
# Header normalization (DuckDB normalize_names=True parity)
# --------------------------------------------------------------------------

def normalize_name(name: str) -> str:
    """Normalize one column name the way DuckDB's ``normalize_names=True``
    does (reference stg_hospital.sql:7-11): trim, lowercase, collapse
    non-alphanumerics to ``_``, strip leading/trailing ``_``, and prefix
    names that start with a digit.
    """
    n = re.sub(r"[^0-9a-zA-Z]+", "_", name.strip().lower()).strip("_")
    if n and n[0].isdigit():
        n = "_" + n
    return n or "col"


def normalize_columns(df: DataFrame) -> DataFrame:
    """Rename every column via :func:`normalize_name`, de-duplicating
    collisions with ``_1``, ``_2``, ... suffixes (DuckDB behavior for
    first-level collisions). The suffix counter keeps incrementing
    until the candidate is UNUSED — a suffixed name must be re-checked
    against every name already taken, or headers like
    ``[a_1, a, a]`` emit a duplicate ``a_1`` and every later
    by-name reference raises AMBIGUOUS_REFERENCE. (DuckDB's own
    escalation beyond the first level is version-dependent; the
    guarantee here is uniqueness with identical common-case names.)
    Pure metadata operation — no job is triggered.
    """
    taken: set[str] = set()
    counts: dict[str, int] = {}
    out: list[str] = []
    for c in df.columns:
        n = normalize_name(c)
        base = n
        while n in taken:
            counts[base] = counts.get(base, 0) + 1
            n = f"{base}_{counts[base]}"
        taken.add(n)
        out.append(n)
    return df.toDF(*out)


# --------------------------------------------------------------------------
# Fact-layer contract (serve_flight.py:285-286)
# --------------------------------------------------------------------------

FACT_CONTRACT = {"job_title": T.StringType(), "total_amount": T.DoubleType()}


class ContractViolation(ValueError):
    """A fact output does not satisfy the cross-industry schema contract."""


def validate_fact_contract(df: DataFrame) -> DataFrame:
    """Assert the cross-industry fact contract; returns df unchanged."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    for name, dtype in FACT_CONTRACT.items():
        if name not in fields:
            raise ContractViolation(f"fact output missing contract column {name!r}")
        if fields[name] != dtype:
            raise ContractViolation(
                f"fact column {name!r} is {fields[name]}, contract requires {dtype}"
            )
    return df
