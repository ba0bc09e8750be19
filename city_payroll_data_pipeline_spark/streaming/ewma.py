"""Streaming EWMA — a custom stateful smoothing operator built on
``applyInPandasWithState``: the streaming twin of the batch fold in
``suite.relational.q_ewma_user_value``.

Per user key, the running average lives in group state as (ewma,
n_events, last_us, last_ord). Each micro-batch folds its rows in
(ts, event_id) order onto the carried accumulator, and rows at or
before the high-water mark (last_us, last_ord) are DROPPED: an EWMA
fold cannot retro-insert a late row without replaying history, and
silently folding it as-if-newest would diverge from the batch twin on
every late arrival. With the guard, stream == batch fold exactly
whenever micro-batch boundaries respect event order (the agreement
the test asserts), and out-of-order spill across a boundary has a
defined, stated policy (late rows ignored) instead of a silent
reordering. State is four scalars per ACTIVE user: update mode emits
the refreshed value each batch and the per-key footprint is constant,
so state size tracks the keyspace, not stream length — safe on an
unbounded feed.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, ewma_value double"
STATE_SCHEMA = (
    "ewma double, n_events bigint, last_us bigint, last_ord bigint"
)


def ewma_stream(
    events: DataFrame,
    alpha: float = 0.3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """acc = α·x + (1−α)·acc in (ts, order_col) order, first value
    seeds the accumulator — identical IEEE fold to the batch twin."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values([ts_col, order_col])
        if state.exists:
            ewma, n, last_us, last_ord = state.get
        else:
            ewma, n, last_us, last_ord = None, 0, -1, -1
        for ts, ordv, x in zip(
            batch[ts_col], batch[order_col], batch[value_col]
        ):
            us = int(ts.timestamp() * 1_000_000)
            ordv = int(ordv)
            if (us, ordv) <= (last_us, last_ord):
                continue  # late arrival: defined drop policy (see top)
            x = float(x)
            ewma = x if ewma is None else alpha * x + (1.0 - alpha) * ewma
            n += 1
            last_us, last_ord = us, ordv
        if ewma is None:
            return  # every row was late; nothing to emit or update
        state.update((ewma, n, last_us, last_ord))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "ewma_value": ewma}]
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
