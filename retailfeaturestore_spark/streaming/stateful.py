"""Custom stateful streaming operator via applyInPandasWithState.

The extension surface's "custom stateful operator" path (build prompt /
SURVEY.md §2.9): when watermarked built-in windows can't express the
semantics — cross-batch running entity state, custom eviction — the
Arrow-batched per-group state API is the Spark-native answer (RocksDB state
store on real clusters).

``running_user_totals``: per-user lifetime counters (event count, exact
value sum, last event time) maintained across micro-batches; each batch
emits the updated totals for users seen in that batch.  This is the
streaming form of the online store's per-entity profile refresh — the
foreachBatch materializer can publish its output directly.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals", "inactivity_sessions"]

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, last_ts timestamp"
)
STATE_SCHEMA = "n_events long, value_sum double, last_us long"


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        n, vsum, last_us = state.get
    else:
        n, vsum, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += int(len(pdf))
        # exact integer-cents accumulation (values are 2-decimal) keeps the
        # running sum order-independent across batches
        vsum += float(pdf["value"].mul(100).round().sum()) / 100.0
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
        last_us = max(last_us, int(ts_us.max()))
    state.update((n, vsum, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [vsum],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value) -> per-batch updated lifetime
    totals per user.  State: one tiny tuple per user (bounded by entity
    cardinality, not event volume)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_sum double"
)
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long, vsum double"


def inactivity_sessions(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 minute"
) -> DataFrame:
    """Custom gap-sessionizer with EVENT-TIME TIMEOUT eviction — the state
    API surface ``running_user_totals`` doesn't exercise: a user's open
    session closes EITHER when a later event arrives past the gap (update
    path) or when the event-time watermark passes ``last_event + gap``
    with no further events (timeout path: ``state.hasTimedOut``, state
    removed).  Emits ONLY closed sessions (append semantics) — the
    in-order result matches the native ``session_window`` operator,
    re-expressed through the custom-state seam so arbitrary per-session
    logic (abandonment scoring, cart contents) can ride along.

    Out-of-order caveat (where this diverges from ``session_window``'s
    retroactive merge): a within-watermark late event for a user with an
    OPEN session extends that session backward (``session_start`` takes
    the min); a late event older than ``session_start - gap`` is emitted
    immediately as its own closed singleton session — once a newer session
    exists, no further event can legally join the older one, but two such
    stragglers that would have shared one session are not re-merged.
    Null ``ts`` rows are dropped (they carry no event time); null
    ``value`` counts as 0.

    State: one open-session tuple per user, evicted on close — bounded by
    concurrently-active users, not history.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def closed_row(user_id, start_us, last_us, n, vsum):
        return {
            "user_id": user_id,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(last_us, unit="us"),
            "n_events": n,
            "value_sum": vsum,
        }

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame([closed_row(user_id, start_us, last_us, n, vsum)])
            return
        open_s = list(state.get) if state.exists else None
        closed = []
        frames = [p for p in pdfs if len(p)]
        if frames:
            # null-ts rows have no event time (the ADVICE-r4 NaT crash
            # class); null value counts as 0 — astype on NaT/NaN raises
            # and permanently wedges the query on checkpoint replay
            batch = pd.concat(frames).dropna(subset=["ts"]).sort_values("ts")
            ts_us = (batch["ts"].astype("int64") // 1000).tolist()
            cents = (
                batch["value"].fillna(0.0).mul(100).round().astype("int64").tolist()
            )
            for t, c in zip(ts_us, cents):
                if open_s is not None and t < open_s[0] - gap_us:
                    # straggler older than any legal extension of the open
                    # session: certainly closed — emit as its own session
                    closed.append(closed_row(user_id, t, t, 1, c / 100.0))
                    continue
                if open_s is not None and t > open_s[1] + gap_us:
                    closed.append(closed_row(user_id, *open_s))
                    open_s = None
                if open_s is None:
                    open_s = [t, t, 0, 0.0]
                open_s[0] = min(open_s[0], t)
                open_s[1] = max(open_s[1], t)
                open_s[2] += 1
                open_s[3] += c / 100.0
        if open_s is not None:
            state.update(tuple(open_s))
            # event-time timeout fires once the watermark passes last + gap
            state.setTimeoutTimestamp((open_s[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
