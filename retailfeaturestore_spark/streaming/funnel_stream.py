"""Streaming funnel: the batch ``operators.funnel`` semantics as a custom
stateful operator (``applyInPandasWithState``).

State per user is exactly ``n_stages`` microsecond timestamps (-1 = stage
not reached) — bounded by entity cardinality, never by event volume.  Each
micro-batch's events are scanned in timestamp order with the greedy rule

    view:     v = min(v, ts)
    click:    if v set and ts > v:  c = min(c, ts)
    purchase: if c set and ts > c:  p = min(p, ts)

which is EXACT for the batch semantics ("first stage-k event strictly after
the stage-(k-1) time") whenever each user's events arrive in
non-decreasing event-time order across batches: in a ts-ordered scan the
running ``v`` at any click equals the final first-view time if that view
precedes the click at all.  Under cross-batch disorder the operator
self-corrects within a batch (the batch is sorted before the scan) but a
late stage-1 event cannot retroactively admit an already-seen stage-2 event
— the documented bounded-state trade-off (exactness under arbitrary
lateness requires buffering all events per user; use the batch operator on
the compacted log for that).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_funnel_stages", "FUNNEL_STAGES"]

FUNNEL_STAGES = ("view", "click", "purchase")

OUTPUT_SCHEMA = (
    "user_id long, stage_view timestamp, stage_click timestamp, "
    "stage_purchase timestamp"
)
STATE_SCHEMA = "v_us long, c_us long, p_us long"

_UNSET = -1


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    v, c, p = state.get if state.exists else (_UNSET, _UNSET, _UNSET)
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch[batch["event_type"].isin(FUNNEL_STAGES)]
    # A null timestamp can't order within a funnel; dropping matches the
    # batch operator's null tolerance — without this, NaT.astype('int64')
    # raises under pandas 2.x and a single bad event would permanently
    # fail the streaming query (ADVICE r4).
    batch = batch.dropna(subset=["ts"])
    batch = batch.sort_values("ts", kind="mergesort")
    # normalize resolution before the integer cast: datetime64[us] input
    # would mis-scale by 1000x (ADVICE r5)
    ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
    for t, kind in zip(ts_us, batch["event_type"]):
        t = int(t)
        if kind == "view":
            v = t if v == _UNSET else min(v, t)
        elif kind == "click":
            if v != _UNSET and t > v:
                c = t if c == _UNSET else min(c, t)
        else:  # purchase
            if c != _UNSET and t > c:
                p = t if p == _UNSET else min(p, t)
    state.update((v, c, p))

    def _ts(us: int):
        return pd.Timestamp(us, unit="us") if us != _UNSET else pd.NaT

    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "stage_view": [_ts(v)],
            "stage_click": [_ts(c)],
            "stage_purchase": [_ts(p)],
        }
    )


def streaming_funnel_stages(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, event_type) -> per-batch updated funnel
    stage times per user (update mode; last emission per user = current
    funnel state, ready for the foreachBatch online-store publisher)."""
    return (
        events.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
