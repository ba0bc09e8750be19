"""Gap-based sessionization (batch form).

A session is a maximal run of a user's events where consecutive gaps
are ≤ ``gap_seconds``. The batch encoding is the classic two-window
composition — lag to flag session starts, running sum to number them —
one shuffle on user_id, everything else in-partition:

    new_session = (ts - lag(ts) > gap) or first-row
    session_id  = sum(new_session) over (user order by ts)

The streaming twin (streaming/sessionize.py) keeps the open session in
``applyInPandasWithState`` state instead of a window; both emit the
same closed-session rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def assign_sessions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 3600,
) -> DataFrame:
    """Adds ``session_id`` (1-based per user) to every event row.
    Gap comparison is on whole epoch seconds (unix_timestamp truncates)
    so engines with different sub-second timestamp precision agree."""
    w = W.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    secs = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(secs).over(w)
    new_session = F.when(
        prev.isNull() | ((secs - prev) > gap_seconds), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 3600,
) -> DataFrame:
    """One row per session: event count + whole-second duration.
    ``order_tiebreak`` is forwarded to :func:`assign_sessions` —
    without it, tables lacking an ``event_id`` column could not use
    this wrapper at all (unresolved-column AnalysisException)."""
    secs = F.unix_timestamp(F.col(ts_col))
    return (
        assign_sessions(
            df, user_col, ts_col, order_tiebreak, gap_seconds=gap_seconds
        )
        .groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(secs) - F.min(secs)).alias("duration_s"),
        )
    )
