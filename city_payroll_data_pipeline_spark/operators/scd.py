"""Type-2 slowly-changing-dimension merge — versioned dimension history
with validity intervals.

The reference pipeline rebuilds every table full-refresh (config.yaml:
``kind FULL`` models; see SURVEY §2.1 S5), which forgets history: when
an employee's department changes, the old attribution is gone. The
warehouse-standard answer is SCD2 — each key keeps a history of rows
``[valid_from, valid_to)`` with exactly one current row — and the
operator that maintains it is a *merge*: given the existing history and
a batch of fresh attribute snapshots,

* keys whose tracked attributes changed: close the current row
  (``valid_to = batch_ts``) and open a new one,
* brand-new keys: open their first row,
* unchanged keys and already-closed history: pass through untouched.

Plan shape (one wide shuffle, scale-safe): the only join is
``current ⟗ updates`` on the key — closed history never enters a
shuffle (it is unioned back by reference), and the updates side of a
daily batch is normally ≪ the dimension, so AQE broadcasts it. All
change detection is a null-safe struct comparison compiled into
whole-stage codegen; no UDFs, no window over the full history. At
100 TB, partition the dimension by key bucket and this merge touches
only the current slice — the same plan Delta/Iceberg MERGE lowers to.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


def scd2_init(snapshot: DataFrame, batch_ts: Column | str) -> DataFrame:
    """Bootstrap an SCD2 history from a first attribute snapshot:
    every row becomes current as of ``batch_ts`` with an open
    interval."""
    ts = F.lit(batch_ts).cast("timestamp") if isinstance(batch_ts, str) else batch_ts
    return snapshot.select(
        "*",
        ts.alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: Sequence[str],
    batch_ts: Column | str,
) -> DataFrame:
    """Merge a fresh snapshot ``updates(key, *tracked)`` into an SCD2
    ``history`` (as produced by :func:`scd2_init` / prior merges).

    ``updates`` must carry exactly ``[key, *tracked]``; ``history``
    carries those plus the three SCD2 bookkeeping columns. Returns the
    new history frame (caller persists it — pair with
    ``operators/upsert.py`` version-flip commits for atomicity).
    """
    ts = F.lit(batch_ts).cast("timestamp") if isinstance(batch_ts, str) else batch_ts
    cols = [key, *tracked]
    upd = updates.select(*cols)

    closed = history.filter(~F.col(IS_CURRENT))
    current = history.filter(F.col(IS_CURRENT))

    # one full-outer join on the key decides every action; <=> (null-safe
    # equality) makes NULL -> value and value -> NULL real changes
    cur = current.alias("c")
    new = upd.alias("u")
    changed = F.lit(False)
    for t in tracked:
        changed = changed | ~F.col(f"c.{t}").eqNullSafe(F.col(f"u.{t}"))
    j = cur.join(new, F.col(f"c.{key}") == F.col(f"u.{key}"), "full_outer")

    in_c = F.col(f"c.{key}").isNotNull()
    in_u = F.col(f"u.{key}").isNotNull()

    # current rows that survive: unchanged, or closed as of batch_ts
    survivors = j.filter(in_c).select(
        *[F.col(f"c.{c}").alias(c) for c in cols],
        F.col(f"c.{VALID_FROM}").alias(VALID_FROM),
        F.when(in_u & changed, ts).otherwise(F.col(f"c.{VALID_TO}")).alias(VALID_TO),
        (~(in_u & changed)).alias(IS_CURRENT),
    )
    # rows opened this batch: new keys + new versions of changed keys
    opened = j.filter(in_u & (~in_c | changed)).select(
        *[F.col(f"u.{c}").alias(c) for c in cols],
        ts.alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )
    return closed.select(*survivors.columns).unionByName(survivors).unionByName(opened)


def as_of_lookup(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    fact_key: str,
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: attach to each fact row the dimension
    attributes that were valid at the fact's own timestamp —
    ``valid_from <= ts < valid_to`` (open ``valid_to`` = still
    current). The reason SCD2 history exists: attribution queries
    ("revenue by the segment the customer was in WHEN they ordered")
    are wrong under a current-state join.

    Plan shape: an equi join on the key with the interval predicate as
    a post-join filter — per-key history is a handful of versions, so
    the equi join dominates and the fan-out before filtering is
    bounded by versions-per-key, not table size. No window over facts,
    no as-of sort-merge needed.
    """
    ts = F.col(f"f.{ts_col}").cast("timestamp")
    cond = (
        (F.col(f"f.{fact_key}") == F.col(f"h.{key}"))
        & (ts >= F.col(f"h.{VALID_FROM}"))
        & (F.col(f"h.{VALID_TO}").isNull() | (ts < F.col(f"h.{VALID_TO}")))
    )
    dim_cols = [c for c in history.columns if c not in (VALID_FROM, VALID_TO, IS_CURRENT, key)]
    return (
        facts.alias("f")
        .join(history.alias("h"), cond, how)
        .select("f.*", *[F.col(f"h.{c}").alias(c) for c in dim_cols])
    )
