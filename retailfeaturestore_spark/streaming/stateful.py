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
        # normalize to ns first: Arrow/pandas may deliver datetime64[us]
        # series, and a bare int64 cast would then mis-scale by 1000x
        # (ADVICE r5)
        ts_us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
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
# PENDING sessions as parallel arrays (value sums in exact integer cents):
# a session is held in state until the watermark certifies it closed.
SESSION_STATE_SCHEMA = (
    "starts array<long>, lasts array<long>, ns array<long>, cents array<long>"
)


def inactivity_sessions(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 minute"
) -> DataFrame:
    """Custom gap-sessionizer with EVENT-TIME TIMEOUT eviction — the state
    API surface ``running_user_totals`` doesn't exercise: per user, every
    event becomes/extends a PENDING session (merge when within ``gap`` of
    a neighbor — late within-watermark events merge exactly like the
    native ``session_window``, backward included), and a pending session
    is emitted as closed only once the event-time watermark passes its
    ``end + gap`` — via the update path when the user has batch data, or
    the timeout path (``state.hasTimedOut``) when it doesn't.  Append
    semantics; emitted rows are watermark-certified, never provisional.

    Null ``ts`` rows are dropped (they carry no event time); null
    ``value`` counts as 0.  State: the user's within-watermark pending
    sessions — the same bound as the native operator's window state.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def closed_row(user_id, s):
        return {
            "user_id": user_id,
            "session_start": pd.Timestamp(s[0], unit="us"),
            "session_end": pd.Timestamp(s[1], unit="us"),
            "n_events": s[2],
            "value_sum": s[3] / 100.0,
        }

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        pending = []
        if state.exists:
            starts, lasts, ns, cents = state.get
            pending = [list(t) for t in zip(starts, lasts, ns, cents)]
        for pdf in pdfs:
            if not len(pdf):
                continue
            # null-ts rows have no event time (the ADVICE-r4 NaT crash
            # class); null value counts as 0 — astype on NaT/NaN raises
            # and permanently wedges the query on checkpoint replay
            pdf = pdf.dropna(subset=["ts"])
            # explicit ns normalization before the integer cast — a
            # datetime64[us] Arrow batch would otherwise mis-scale every
            # event time by 1000x and close sessions instantly (ADVICE r5)
            ts_us = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
            ).tolist()
            ev_cents = (
                pdf["value"].fillna(0.0).mul(100).round().astype("int64").tolist()
            )
            pending.extend([t, t, 1, c] for t, c in zip(ts_us, ev_cents))
        if not pending:
            if state.hasTimedOut:
                state.remove()
            return
        pending.sort(key=lambda s: (s[0], s[1]))
        merged = [pending[0]]
        for s in pending[1:]:
            cur = merged[-1]
            if s[0] <= cur[1] + gap_us:
                cur[1] = max(cur[1], s[1])
                cur[2] += s[2]
                cur[3] += s[3]
            else:
                merged.append(s)
        closed = [s for s in merged if s[1] + gap_us < wm_us]
        keep = [s for s in merged if s[1] + gap_us >= wm_us]
        if keep:
            state.update(
                (
                    [s[0] for s in keep],
                    [s[1] for s in keep],
                    [s[2] for s in keep],
                    [s[3] for s in keep],
                )
            )
            # fire when the earliest pending session can close; the +1 ms
            # guard keeps the timestamp strictly above the watermark
            expiry_ms = min(s[1] + gap_us for s in keep) // 1000
            state.setTimeoutTimestamp(max(expiry_ms, wm_us // 1000 + 1))
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame([closed_row(user_id, s) for s in closed])

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
