"""Streaming sessionization — a custom stateful operator built on
``applyInPandasWithState``.

Per user key, the open session lives in group state (session ordinal,
start/last epoch seconds, event count). Each micro-batch folds its
events in event-time order; a gap > ``gap_seconds`` closes the current
session (emitted downstream) and opens the next. A processing-time
timeout flushes open sessions for users that go quiet, leaving only a
one-row ordinal tombstone per user (so a returning user's sessions
keep numbering monotonically instead of colliding with already-emitted
(user, session_id) keys) — heavy per-session state tracks *active*
users; the tombstone residue is one bigint per user ever seen.

Output rows are CLOSED sessions only (append mode); the batch twin
(operators/sessions.py) emits the same rows for the same input plus
the still-open tail sessions.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, duration_s bigint"
)
STATE_SCHEMA = (
    "session_id bigint, start_s bigint, last_s bigint, n_events bigint"
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    flush_timeout_seconds: int | None = None,
) -> DataFrame:
    """``flush_timeout_seconds`` controls the quiet-user flush: with a
    value, a processing-time timeout emits + evicts the open session
    after that much silence (set it ≈ gap_seconds in production — this
    is what bounds state). With None, no timeouts are registered: open
    sessions stay in state forever, but a trigger(availableNow) drain
    terminates once the backlog is processed — pending timeouts
    otherwise keep the no-data batch loop alive (use None for bounded
    test/backfill drains)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fn = _make_session_fold(gap_seconds, ts_col, flush_timeout_seconds)

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if flush_timeout_seconds is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout_conf,
    )


def _make_session_fold(gap_seconds, ts_col, flush_timeout_seconds):
    """The per-key fold, exposed as a factory so the timeout path —
    which availableNow test drains can never fire — is unit-testable
    against a stub GroupState."""

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            sid, start_s, last_s, n = state.get
            # flush the open session but KEEP the ordinal as a
            # tombstone (sid+1, no open session): a full remove would
            # restart a returning user at session_id=1, emitting
            # duplicate (user_id, session_id) keys into the append
            # stream. The tombstone is one small row per quiet user —
            # the heavy open-session fields are gone, and no further
            # timeout is registered for it, so it never re-fires.
            # (Per-user monotone ordinals fundamentally need that one
            # row; if even that is too much at extreme scale, the
            # engine's native session_window job is the alternative.)
            if start_s is not None:
                state.update((sid + 1, None, None, 0))
                yield pd.DataFrame(
                    [
                        {
                            "user_id": user_id,
                            "session_id": sid,
                            "n_events": n,
                            "duration_s": last_s - start_s,
                        }
                    ]
                )
            # a tombstone that times out again is left untouched —
            # bumping it would skip ordinals, emitting gaps
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(ts_col)
        if state.exists:
            sid, start_s, last_s, n = state.get
        else:
            sid, start_s, last_s, n = 1, None, None, 0

        closed = []
        for ts in batch[ts_col]:
            t = int(ts.timestamp())  # whole seconds, matches unix_timestamp
            if start_s is None:
                start_s, last_s, n = t, t, 1
            elif t - last_s > gap_seconds:
                closed.append((user_id, sid, n, last_s - start_s))
                sid += 1
                start_s, last_s, n = t, t, 1
            else:
                last_s, n = t, n + 1

        state.update((sid, start_s, last_s, n))
        if flush_timeout_seconds is not None:
            state.setTimeoutDuration(flush_timeout_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "n_events", "duration_s"],
            )

    return fn
