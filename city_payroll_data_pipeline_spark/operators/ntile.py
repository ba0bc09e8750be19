"""Exact NTILE without a global sort — the scale path for quantile
binning.

``NTILE(k) OVER (ORDER BY v, tiebreak)`` is the one-line way to
decile a table, and at 100 TB it is a scale killer: an unpartitioned
window funnels every row through ONE reducer. But NTILE's bucket of a
row depends only on the row's GLOBAL RANK and the total count — and
the global rank decomposes into

    rank(row) = (#rows with value < v)  +  (rank of row WITHIN its
                 value group, ordered by the tiebreaker)

The first term is a cumulative sum over the DISTINCT-VALUE frame
(cardinality ≪ rows — the ks_source_drift pattern); the second is a
``row_number`` PARTITIONED by value (every group sorts in parallel).
Bucket assignment is then pure arithmetic replaying NTILE's spec —
with ``n`` rows and ``k`` buckets the first ``n mod k`` buckets get
``n div k + 1`` rows, the rest ``n div k`` — so the result is
bit-identical to NTILE (which is what the DuckDB oracle runs) while
the largest sort is the biggest single value group.

Used by the ``*_scaled`` suite variants (length_deciles_scaled,
quality_logit_deciles_scaled, rfm_segments_scaled); the exact NTILE
originals double as their oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def ntile_no_global_sort(
    df: DataFrame,
    n_buckets: int,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "bucket",
    descending: bool = False,
) -> DataFrame:
    """Adds ``out_col`` = NTILE(n_buckets) OVER (ORDER BY value_col
    [DESC], tiebreak_col) — bit-identical to the window form, no
    unpartitioned row-level window. (value_col, tiebreak_col) must be
    a unique ordering, same contract as the window form needs for
    determinism.

    NULL values rank where Spark's own window sort puts them (first
    for ASC, last for DESC): the join back is null-safe, so NULL rows
    are binned, never dropped. Note DuckDB defaults to NULLS LAST on
    ASC — an oracle comparing against DuckDB NTILE must ensure a
    non-null value_col (all three suite call sites do)."""
    order_val = F.col(value_col).desc() if descending else F.col(value_col)
    per_val = df.groupBy(value_col).agg(F.count("*").alias("_c"))
    w_cum = W.orderBy(order_val).rowsBetween(W.unboundedPreceding, -1)
    # unpartitioned window over the DISTINCT-VALUE frame — the point
    cums = (
        per_val.withColumn(
            "_below", F.coalesce(F.sum("_c").over(w_cum), F.lit(0))
        )
        .drop("_c")
        .withColumnRenamed(value_col, "_v")
    )
    tot = df.groupBy().agg(F.count("*").alias("_n"))
    w_in = W.partitionBy(value_col).orderBy(tiebreak_col)
    ranked = (
        # eqNullSafe: a NULL value group must still find its cumsum row
        # (plain equality would silently drop every NULL-valued input)
        df.join(cums, F.col(value_col).eqNullSafe(F.col("_v")))
        .drop("_v")
        .join(F.broadcast(tot))
        .withColumn("_r", F.col("_below") + F.row_number().over(w_in))
    )
    # NTILE spec: base = n div k, rem = n mod k; buckets 1..rem hold
    # base+1 rows, buckets rem+1..k hold base rows.
    base = F.expr(f"_n div {n_buckets}")
    rem = F.col("_n") % n_buckets
    big = rem * (base + 1)  # rows covered by the base+1-sized buckets
    bucket: Column = F.when(
        F.col("_r") <= big,
        F.expr(f"(_r - 1) div (_n div {n_buckets} + 1)") + 1,
    ).otherwise(
        # base can only be 0 when every row landed in the first branch,
        # so the division here never sees a zero at runtime
        rem + 1 + F.expr(
            f"(_r - (_n % {n_buckets}) * (_n div {n_buckets} + 1) - 1)"
            f" div (_n div {n_buckets})"
        ),
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "_below", "_n", "_r"
    )
