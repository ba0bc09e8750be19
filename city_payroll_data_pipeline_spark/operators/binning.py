"""Quantile binning at scale: approximate cut points + width_bucket.

Exact ntile needs a TOTAL order — one global sort with every row
through a single ordering (the suite's ``length_deciles`` query shows
Spark's "Moving all data to a single partition" warning for exactly
this reason). The scale path decouples the two halves:

1. cut points from ``percentile_approx`` (Greenwald-Khanna sketch):
   one pass, map-side partials, a few KB of state per partition —
   no sort, no global exchange of rows;
2. bucket assignment as a pure map (`width_bucket` against the
   broadcast cut-point literals) — embarrassingly parallel.

The trade is exactness at bucket boundaries (sketch error ~1/accuracy
quantile mass); the suite's ntile query doubles as the accuracy
oracle (see tests/test_training_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_cut_points(
    df: DataFrame, col: str, n_buckets: int, accuracy: int = 10_000
) -> list[float]:
    """Interior quantile cut points (n_buckets - 1 values) from one
    sketch pass. ``accuracy`` bounds rank error at N/accuracy rows."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.percentile_approx(
            F.col(col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("cuts")
    ).first()
    return [float(c) for c in row["cuts"]]


def bucket_expr(col: Column, cuts: list[float]) -> Column:
    """1-based bucket index against sorted cut points: a codegen'd
    fold counting cut points strictly below the value (ties land in
    the lower bucket, like ntile's boundary). Pure map — no shuffle.

    NULL in → NULL out (width_bucket semantics): without the guard,
    each ``when(col > c)`` of the fold would take the otherwise(0)
    branch on a NULL comparison and NULL rows would land in bucket 1,
    indistinguishable from genuinely small values."""
    fold = F.aggregate(
        F.array(*[F.lit(float(c)) for c in cuts]),
        F.lit(1),
        lambda acc, c: acc + F.when(col > c, 1).otherwise(0),
    )
    return F.when(col.isNull(), F.lit(None)).otherwise(fold)


def with_quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int,
    out_col: str = "bucket",
    accuracy: int = 10_000,
) -> DataFrame:
    """Assign every row a quantile bucket in two passes (sketch +
    map), never a global sort."""
    cuts = approx_cut_points(df, col, n_buckets, accuracy)
    return df.withColumn(out_col, bucket_expr(F.col(col), cuts))
