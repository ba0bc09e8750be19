"""Generic as-of (temporal point-in-time) join.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive encoding —
a range join ``l.ts >= r.ts`` + keep-latest — explodes to O(|L|·|R|)
pairs per key before the reduction. This operator uses the
union + sorted-window carry-forward encoding instead:

    union(left tagged 1, right tagged 0)
    → one shuffle on the join key
    → per-key sort by (ts, tag)            (right-at-equal-ts wins)
    → last(payload, ignorenulls) carry-forward
    → keep left rows

Cost is exactly one Exchange + one in-partition sort — the same shape
as any window aggregation, independent of how many right rows precede
each left row. At 100 TB this is the difference between a windowed
shuffle and a joined blowup; skewed keys get the same salting remedy
as any hot window key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_TAG = "_asof_is_left"
_TS = "_asof_ts"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """For every left row, attach the payload of the latest right row
    with the same ``by`` key and ``right_ts <= left_ts`` (nulls when no
    such row — LEFT ASOF semantics).

    Determinism contract: the caller must reduce ``right`` to at most
    one row per (by, right_ts) — with duplicates, which one wins is
    tie-broken differently across engines. The whole payload is
    carried as ONE struct per right row, so a NULL payload value in
    the matched row stays NULL (row-atomic — no torn carry mixing
    columns from different right rows).
    """
    lt = left.withColumn(_TAG, F.lit(1)).withColumn(_TS, F.col(left_ts))
    rt = (
        right.select(F.col(right_ts).alias(_TS), by, *payload)
        .withColumn(_TAG, F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        W.partitionBy(by)
        .orderBy(_TS, _TAG)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # one struct per RIGHT row: every payload column (and the match
    # decision) comes from the same physical row by construction
    carried = merged.select(
        "*",
        F.last(
            F.when(F.col(_TAG) == 0, F.struct(*payload)),
            ignorenulls=True,
        ).over(w).alias("_asof_row"),
    )
    return (
        carried.filter(F.col(_TAG) == 1)
        .drop(_TAG, _TS, *payload)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"_asof_row.{c}").alias(c) for c in payload],
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Forward as-of: for every left row, attach the payload of the
    EARLIEST right row with the same ``by`` key and
    ``right_ts >= left_ts`` — optionally only if it falls within
    ``tolerance`` (a Spark interval literal, e.g. ``"INTERVAL 30
    DAYS"``; pandas ``merge_asof(direction='forward', tolerance=...)``
    parity). Nulls when no such row.

    Same one-Exchange-one-sort shape as the backward join, mirrored:
    left rows sort BEFORE right rows at equal ts (tag 1 < 2), and the
    carry looks at the FOLLOWING frame — so an equal-ts right row
    matches, per forward-asof convention. The tolerance check runs on
    the matched right timestamp AFTER the carry: if the earliest
    forward match is already beyond the tolerance, every later one is
    too, so nulling the payload is exact (not an approximation).

    The matched timestamp and every payload column are carried as ONE
    struct per right row (ADVICE r4): a NULL payload value in the
    earliest forward row can never tear the match — the tolerance
    gate, ``_asof_matched_ts``, and the payload always describe the
    same physical right row.

    Determinism contract as backward: at most one right row per
    (by, right_ts)."""
    lt = left.withColumn(_TAG, F.lit(1)).withColumn(_TS, F.col(left_ts))
    rt = (
        right.select(F.col(right_ts).alias(_TS), by, *payload)
        .withColumn(_TAG, F.lit(2))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        W.partitionBy(by)
        .orderBy(_TS, _TAG)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = merged.select(
        "*",
        F.first(
            F.when(
                F.col(_TAG) == 2,
                F.struct(F.col(_TS).alias("_rts"), *payload),
            ),
            ignorenulls=True,
        ).over(w).alias("_asof_row"),
    )
    if tolerance is None:
        within = F.lit(True)
    else:
        within = (
            F.col("_asof_row._rts") <= F.col(_TS) + F.expr(tolerance)
        )
    return (
        carried.filter(F.col(_TAG) == 1)
        .drop(_TAG, *payload)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(within, F.col(f"_asof_row.{c}")).alias(c)
                for c in payload
            ],
            F.when(within, F.col("_asof_row._rts")).alias(
                "_asof_matched_ts"
            ),
        )
    )
