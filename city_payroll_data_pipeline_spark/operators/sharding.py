"""Range-sharded ordered export — globally-ordered output without a
global sort.

Writing 100 TB in total order is the classic terasort shape: a single
``orderBy`` funnels everything through one range-partitioned shuffle
whose boundaries Spark picks by sampling (non-deterministic), and the
final files are only ordered if nothing downstream re-shuffles. The
production pattern is instead:

1. compute explicit shard boundaries (quantiles of the sort key),
2. tag every row with its shard,
3. hive-partition the write by shard, sorting within partitions,

so each shard directory covers a disjoint key range and every file
inside it is sorted — readers get global order by visiting shards in
order, writers get full parallelism, and the boundary computation is
the only extra pass. This is also exactly the layout downstream
training jobs want for deterministic, resumable sharded reads.

The reference has no sharded export (its full export is a single
``ORDER BY job_title`` stream, serve_flight.py:291) — this is the
at-scale generalization of that operator.

Boundaries use EXACT percentiles so the shard assignment is
reproducible run-to-run and engine-to-engine (the DuckDB oracle
replays it); ``repartitionByRange`` by contrast samples with a
nondeterministic seed. At 100 TB swap :func:`range_shard_boundaries`
for ``approx_percentile`` (one map-side sketch pass, no sort) if
last-row-exact shard placement isn't required — the write layout and
ordering guarantees are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def range_shard_boundaries(
    df: DataFrame, key: str, n_shards: int, round_dp: int = 6
) -> list[float]:
    """The n_shards-1 interior quantile cuts of ``key``, rounded to
    ``round_dp`` decimals (both engines interpolate exact percentiles
    at p·(n-1); the round absorbs last-ulp association differences so
    a row can never straddle the two engines' boundaries). One
    aggregation pass; the result is a handful of scalars collected to
    the driver — the same thing ``repartitionByRange``'s sampler does,
    but deterministically."""
    if n_shards <= 1:
        return []  # F.percentile of an empty quantile list yields NULL
    qs = [i / n_shards for i in range(1, n_shards)]
    # round IN-PLAN with F.round (HALF_UP on the shortest decimal
    # repr): Python round() is half-even and would disagree on an
    # exact .5 at the last kept decimal. NOTE an oracle replaying
    # these cuts must use parity._sql_round, NOT DuckDB's native
    # round() — DuckDB rounds in binary (x*10^n)/10^n and can differ
    # from F.round by 1 ulp on .xx5 representations, re-introducing
    # the cross-engine boundary-straddle the rounding exists to absorb
    row = df.agg(
        F.transform(
            F.percentile(key, F.array(*[F.lit(q) for q in qs])),
            lambda b: F.round(b, round_dp),
        ).alias("bs")
    ).collect()[0]
    return [float(b) for b in row["bs"]]


def approx_shard_boundaries(
    df: DataFrame, key: str, n_shards: int, accuracy: int = 1000
) -> list:
    """Boundary cuts from the mergeable approx-percentile sketch — one
    map-side partial agg, no exact single-group percentile sort. Use
    where ANY monotone cut is correct: the two-phase rank/cumsum
    splice (rowids, _sharded_sweep) recomputes exact offsets from the
    ACTUAL shard contents, so boundary placement affects only load
    balance, never results. Keep :func:`range_shard_boundaries` where
    the cut placement itself is part of the contract (the reproducible
    sharded-export layout)."""
    if n_shards <= 1:
        return []
    qs = [i / n_shards for i in range(1, n_shards)]
    row = df.agg(
        F.percentile_approx(
            key, F.array(*[F.lit(q) for q in qs]), F.lit(accuracy)
        ).alias("bs")
    ).collect()[0]
    return list(row["bs"])


def assign_range_shards(
    df: DataFrame, key: str, boundaries: list[float]
) -> DataFrame:
    """Adds ``shard`` (0..len(boundaries)): the count of boundaries the
    key is >= — a branch-free expression that whole-stage-codegen
    compiles to straight-line comparisons, no join and no shuffle."""
    shard = F.lit(0)
    for b in boundaries:
        shard = shard + F.when(F.col(key) >= F.lit(b), 1).otherwise(0)
    return df.withColumn("shard", shard.cast("int"))


def write_range_sharded(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
) -> list[float]:
    """Materialize ``df`` as ``path/shard=N/...`` with every file
    internally sorted by ``key`` and shard N's key range entirely below
    shard N+1's. ``repartition(n, shard)`` co-locates each shard's rows
    (hash collisions may put two shards in one task — harmless, the
    hive partitioning still splits them into separate directories and
    the sort key leads with ``shard`` so each output file stays
    single-shard-sorted). Returns the boundaries used."""
    bounds = range_shard_boundaries(df, key, n_shards)
    tagged = assign_range_shards(df, key, bounds)
    (
        tagged.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", key)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return bounds
