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

__all__ = ["running_user_totals"]

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
