"""Data-cleaning column expressions (currency strip, casts, defaults).

All expressions here are built-in ``pyspark.sql.functions`` — they stay
inside whole-stage codegen and cost nothing extra at 100 TB scale.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

#: characters stripped from money strings (reference stg_corporate.sql:21
#: ``REGEXP_REPLACE(col, '[$,]', '', 'g')`` — Spark's regexp_replace is
#: global by default, matching DuckDB's 'g' flag).
MONEY_JUNK_PATTERN = "[$,]"


def money_to_double(col: Column) -> Column:
    """``"$85,432.10"`` -> 85432.10 (malformed input -> NULL).

    Cast-semantics note (SURVEY §1.3): the reference's DuckDB CAST
    errors on malformed input; at 100 TB a single garbage row must not
    kill the job, so this engine uses ``try_cast`` (malformed -> NULL,
    then zero-filled by the COALESCE policy) regardless of the
    session's ANSI setting. Well-formed money parses identically.
    """
    return F.regexp_replace(col, MONEY_JUNK_PATTERN, "").try_cast("double")


def nullif_zero(col: Column) -> Column:
    """``NULLIF(col, 0)`` div-by-zero guard (fct_corporate.sql:34)."""
    return F.when(col != 0, col)


def zero_fill(col: Column, default: float = 0.0) -> Column:
    """``COALESCE(col, default)`` (stg_corporate.sql:26-30)."""
    return F.coalesce(col, F.lit(default))


def processed_at_column(frozen=None) -> Column:
    """Audit timestamp (stg_*.sql ``CURRENT_TIMESTAMP AS processed_at``).

    ``frozen`` (ISO string or datetime) pins the value for deterministic
    golden tests; None keeps reference behavior (current_timestamp()).
    """
    if frozen is None:
        return F.current_timestamp()
    if isinstance(frozen, str):
        frozen = _dt.datetime.fromisoformat(frozen)
    return F.lit(frozen).cast("timestamp")
