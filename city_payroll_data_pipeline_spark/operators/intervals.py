"""Bucketed interval-overlap join.

Beyond-parity operator (the reference's only join surface is the
stg→fct projection; SURVEY §2.3): find pairs of time intervals that
OVERLAP — concurrent sessions, conflicting maintenance windows,
co-occurring media segments. The naive formulation is a ϴ-join
(`a.start <= b.end AND b.start <= a.end`) which Spark can only plan
as a broadcast nested loop or cartesian product — quadratic and
un-shardable at 100 TB.

The scale shape is the classic bin-and-dedup decomposition:

1. explode each interval into the fixed-width buckets it touches
   (`sequence(start div W, end div W)` — pure codegen, no UDF);
2. equi-join on the bucket id — Spark shuffles both sides on a KEY
   again, so the join is hash-partitioned and AQE-skew-splittable;
3. keep a candidate only when the exact overlap predicate holds;
4. de-duplicate multi-bucket matches WITHOUT a distinct: keep the
   copy where the bucket equals the bucket containing the overlap's
   START (`greatest(a.start, b.start) div W == bkt`) — that bucket is
   touched by both intervals exactly once, so each qualifying pair
   survives exactly once, map-side, no extra shuffle.

Fan-out is `duration div W + 1` buckets per interval — pick W near
the typical interval length so the explode is a small constant. The
same decomposition runs unchanged on a 1000-executor cluster: only
bucket ids cross the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    pred: Column,
    bucket_width: int,
) -> DataFrame:
    """Join ``a`` and ``b`` on interval overlap (closed intervals in
    whole units, e.g. epoch seconds), plus the caller's ``pred``
    (e.g. ``user_a < user_b`` for a self-join's canonical ordering).

    Column names across ``a`` and ``b`` must be disjoint (rename
    before calling). Adds ``overlap_s = least(ends) - greatest(starts)``
    (≥ 0; touching endpoints count as a 0-length overlap).
    """
    w = int(bucket_width)
    ea = a.withColumn(
        "__bkt", F.explode(F.expr(f"sequence({a_start} div {w}, {a_end} div {w})"))
    )
    eb = b.withColumn(
        "__bkt", F.explode(F.expr(f"sequence({b_start} div {w}, {b_end} div {w})"))
    )
    overlap = F.least(F.col(a_end), F.col(b_end)) - F.greatest(
        F.col(a_start), F.col(b_start)
    )
    return (
        ea.join(eb, "__bkt")
        .filter(
            pred
            & (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (
                F.expr(f"greatest({a_start}, {b_start}) div {w}")
                == F.col("__bkt")
            )
        )
        .drop("__bkt")
        .withColumn("overlap_s", overlap)
    )
