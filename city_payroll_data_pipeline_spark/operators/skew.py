"""Skew-resistant salted equi-join.

A hash join shuffles both sides on the key: one hot key (a celebrity
user, a default tenant id) lands its entire volume on one reducer and
the stage runs at the speed of that task. AQE's skew-join splitting
handles many cases at runtime; this operator is the explicit form for
when the skew is known and extreme:

    big side:   salt = pmod(salt_expr, n)          (splits the hot key n ways)
    small side: replicated n× (one copy per salt)
    join on (key, salt) → same rows as the plain join, n-way spread

Cost model: the small side's shuffle volume multiplies by n — worth it
exactly when (hot-key volume / n) still dominates (small side × n).
The salt affects only row placement, never the result, so the salted
join shares the plain join's oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Heavy-hitter diagnostic for a join/groupBy key — the measurement
    that justifies (or rules out) :func:`salted_join` before shuffling
    100 TB on that key. One map-side-combined count per key, a top-n
    (TakeOrderedAndProject, no global sort materialization), and a
    1-row stats broadcast.

    Returns the ``top_n`` heaviest keys with their row count, share of
    all rows, and ``skew_factor`` = count / mean-count-per-key (1.0 ⇒
    uniform; a reducer processing that key runs ~skew_factor× longer
    than average)."""
    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.count("*").alias("n_keys"), F.sum("cnt").alias("n_rows")
    )
    return (
        counts.orderBy(F.desc("cnt"), key)
        .limit(top_n)
        .crossJoin(F.broadcast(stats))
        .select(
            key,
            "cnt",
            "n_keys",
            "n_rows",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("row_share"),
            F.round(
                F.col("cnt") * F.col("n_keys") / F.col("n_rows"), 6
            ).alias("skew_factor"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    salt_expr: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with an n-way salt on the big side.

    ``salt_expr`` distributes a hot key's rows across reducers; any
    expression works because it never reaches the output — default is
    a hash of the big key plus the partition id (deterministic enough
    to spread, never collected). Supports inner and left joins (the
    small side is the replicated one; right/full would replicate the
    wrong side)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salt = (
        salt_expr
        if salt_expr is not None
        else F.pmod(F.hash(F.col(big_key)) + F.spark_partition_id(), F.lit(n_salts))
    )
    big_s = big.withColumn(SALT, salt.cast("int"))
    small_s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s[SALT] == small_s[SALT]),
        how,
    )
    return joined.drop(SALT)
