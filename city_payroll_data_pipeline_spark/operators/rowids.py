"""Stable contiguous global row IDs without a global sort.

``ROW_NUMBER() OVER (ORDER BY key)`` is the one-line way to number a
table — and at 100 TB it is a scale killer: a window with no
PARTITION BY funnels every row through ONE reducer. The production
pattern (the same two-phase shape as ``operators/sharding.py``'s
ordered export) is:

1. cut the key space into n_shards ranges with exact quantile
   boundaries (deterministic, engine-replayable — unlike
   ``repartitionByRange``'s sampled, seed-dependent boundaries),
2. branch-free tag each row with its shard (map-side, no shuffle),
3. count rows per shard (a partial-agg over n_shards groups) and
   prefix-sum the counts into per-shard offsets on the tiny
   n_shards-row frame,
4. broadcast-join the offsets back and number rows WITHIN each shard
   (`row_number` partitioned by shard — every shard sorts in
   parallel), adding the offset.

The result is bit-identical to the global ROW_NUMBER (which is what
the DuckDB oracle runs) but the largest sort is 1/n_shards of the
data and the only full-data exchange is the shard-partitioned window
shuffle. ``monotonically_increasing_id`` by contrast is neither
contiguous nor stable across runs — fine for uniqueness, useless for
resumable training-data addressing, which is what this operator
exists for (example-index manifests, deterministic epoch shuffling).

Reference parity note: the reference engine has no row-id surface at
all (SURVEY §2) — this is a beyond-parity scale primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.operators.sharding import (
    assign_range_shards,
    range_shard_boundaries,
)


def stable_row_ids(
    df: DataFrame,
    key: str,
    tiebreakers: tuple[str, ...] = (),
    n_shards: int = 8,
    id_col: str = "row_id",
) -> DataFrame:
    """Adds ``id_col``: 1-based contiguous IDs in (key, *tiebreakers)
    order. (key, *tiebreakers) must be a unique ordering for the IDs
    to be deterministic — same contract as any ORDER BY numbering."""
    boundaries = range_shard_boundaries(df, key, n_shards)
    tagged = assign_range_shards(df, key, boundaries)

    counts = tagged.groupBy("shard").agg(F.count("*").alias("cnt"))
    # n_shards rows: the single-partition window here is the POINT —
    # prefix-summing a handful of counts, not the data.
    w_off = W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "shard",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("id_offset"),
    )

    w_in = W.partitionBy("shard").orderBy(key, *tiebreakers)
    return (
        tagged.join(F.broadcast(offsets), "shard")
        .withColumn(
            id_col,
            (F.col("id_offset") + F.row_number().over(w_in)).cast("bigint"),
        )
        .drop("shard", "id_offset")
    )
