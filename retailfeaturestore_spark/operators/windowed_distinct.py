"""Exact event-time-windowed distinct counts WITHOUT per-row set state.

``collect_set(...).over(range_window)`` (the small-entity W3 path in
``window_features``) keeps every distinct key of the window in memory per
row — fine at retail cardinalities, pathological for whale entities at
100 TB (a customer seeing 10^6 SKUs in a 30-day horizon materializes a
10^6-element set per output row).

This module computes the SAME exact value with O(1) per-row state via the
interval-delta decomposition::

    distinct(t) = C(t) - P(t)

    C(t) = # rows in [t-w, t]
    P(t) = # consecutive same-key occurrence pairs
           (a=prev_ts, b=ts) active at t, i.e. b <= t AND a >= t-w

For a key with m occurrences inside the window the m occurrences are
consecutive in the key's full timeline, contributing m rows to C and m-1
pairs to P — so C - P counts each present key exactly once.  Each pair is
active for ``t in [b, a+w]``: encode it as a +1 event at time ``b`` and a
-1 event at time ``a+w+1µs`` (one tick past the inclusive upper bound), and
P(t) is a cumulative sum.  Pairs with ``b - a > w`` can never be active and
are dropped at the source.

Physical shape (v4 — ONE exchange, ONE post-explode sort, every frame
*incremental* inside ONE WindowExec):

- One hash exchange on the entity key serves the entire operator.  The
  previous-same-key-occurrence lag runs over a partition-local
  ``(key, time)`` sort with a same-key guard; each row then EXPLODES into
  its query event plus its pair +1/-1 delta events.  Explode preserves the
  hash partitioning (a union of separate query/delta branches would not —
  UnionExec reports unknown partitioning, forcing a re-exchange and
  re-executing the upstream scan per branch), so the frame pass needs only
  a partition-local re-sort on ``(time)``.
- The +1µs shift on the -1 events makes EVERY accumulation a growing range
  frame over the single ``(time)`` ordering (growing frames evaluate
  incrementally; a sliding ``[-w, 0]`` frame re-aggregates its buffer per
  row):
  * ``P(t)``: cumulative sum of the shifted deltas,
  * ``C(t) = A(t) - B_w(t)``: ``[unbounded, 0]`` minus
    ``[unbounded, -w-1µs]``,
  and because all frames share one partition+order spec they evaluate in
  ONE WindowExec.  (The previous (time, kind)-ordered rows-frame
  formulation for P cost a second post-explode sort AND a second window
  pass; the event kind now only tags query rows for the output filter.)

The explode roughly triples the row count with skinny delta rows (payload
NULL) — at 100 TB that is a 3x pass of long triples versus per-row set
materialization, and it never falls over on skew.

Tie semantics match SQL RANGE frames (all rows at the same timestamp see
the same window): a +1 event at a query row's exact instant is inside the
row's ``[unbounded, 0]`` frame (a pair is active from its start,
inclusive); a -1 event never shares a boundary instant with a query row it
should still count, thanks to the +1µs shift.

Reference parity: the reference's pandas ``rolling(...).apply(nunique)``
per-customer loop (``jobs/build_feature_views.py:44-47``) — same value,
executed as distributed window algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expressions import epoch_us

__all__ = ["exact_windowed_distinct", "MICROS_PER_DAY"]

MICROS_PER_DAY = 86_400 * 1_000_000


def exact_windowed_distinct(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    key_col: str,
    windows: dict[str, int],
    out_prefix: str = "unique",
    epoch_col: str | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``{out_prefix}_{suffix}`` = exact distinct ``key_col`` count
    over the both-closed range window ``[t - days, t]`` per entity.

    ``windows`` maps suffix -> horizon days.  NULL keys are excluded from
    the count (SQL ``count(DISTINCT ...)`` / ``collect_set`` semantics).
    All original columns are preserved; one entity-key shuffle feeds every
    output frame.

    ``epoch_col`` names an *existing* epoch-microseconds long column to use
    as the event time.  When given, the output emits ``entity_col`` and
    ``epoch_col`` as direct aliases of the internal partition/order
    attributes — ProjectExec is alias-aware, so downstream operators that
    partition on ``entity_col`` and order by ``epoch_col`` (e.g. the W1-W5
    range-frame family) reuse this operator's exchange and sort instead of
    shuffling again.

    ``payload_cols`` (optional) trims the struct that rides each exploded
    query event to exactly these columns — others are DROPPED from the
    output.  Catalyst's nested-column pruning does not reach inside the
    explode's array-of-struct construction (verified on the physical plan:
    the Generate materializes every field even when downstream extracts a
    subset), so callers that know their projection pass it explicitly; the
    delta rows always stay skinny (key, time, kind, ±1 deltas, NULL
    payload) either way.
    """
    horizons = {s: d * MICROS_PER_DAY for s, d in windows.items()}
    d_cols = [f"__d_{s}" for s in horizons]

    if epoch_col is None:
        base = df.withColumn("__t", epoch_us(ts_col))
        default_payload = df.columns
    else:
        base = df.withColumn("__t", F.col(epoch_col))
        default_payload = [c for c in df.columns if c not in (entity_col, epoch_col)]
    payload_cols = default_payload if payload_cols is None else list(payload_cols)
    payload = F.struct(*payload_cols)
    payload_type = base.select(payload.alias("__p")).schema["__p"].dataType

    # ONE exchange for the whole operator: the previous-occurrence lag runs
    # partitioned by the entity alone (ordered key-then-time, with a
    # same-key guard), and each row then EXPLODES into its query event plus
    # its pair-delta events — explode preserves hash partitioning, where a
    # union of two branches would not (UnionExec reports unknown
    # partitioning and forces a re-exchange AND re-executes the upstream
    # scan per branch).  The running-sum window below then needs only a
    # partition-local re-sort.  Skew note: partitioning the lag by entity
    # (not (entity, key)) concentrates a whale entity in one partition — the
    # same exposure as the final per-entity window itself, so it does not
    # change the operator's skew class.
    pre = base.select(
        F.col(entity_col).alias("__e"),
        "__t",
        F.col(key_col).alias("__k"),
        payload.alias("__p"),
    )
    w_lag = Window.partitionBy("__e").orderBy("__k", "__t")
    same_key = F.lag("__k").over(w_lag) == F.col("__k")
    pre = pre.withColumn(
        "__prev", F.when(same_key, F.lag("__t").over(w_lag))
    )

    # One array element per event: the query row itself (kind 1, carries the
    # payload), a +1 pair-start at t (kind 0, indicator per horizon the pair
    # can ever hit), and a -1 pair-end at prev + w per surviving horizon
    # (kind 2); dead elements are nulled then compacted.
    gap = F.col("__t") - F.col("__prev")
    max_w = max(horizons.values())
    elem_fields = lambda time, kind, c, ds, p: F.struct(  # noqa: E731
        time.alias("t"), F.lit(kind).alias("k"), c.cast("long").alias("c"),
        *[d.cast("long").alias(col) for d, col in zip(ds, d_cols)],
        p.alias("p"),
    )
    null_p = F.lit(None).cast(payload_type)
    query_elem = elem_fields(
        F.col("__t"), 1, F.col("__k").isNotNull().cast("long"),
        [F.lit(0) for _ in d_cols], F.col("__p"),
    )
    pair_live = F.col("__prev").isNotNull() & (gap <= F.lit(max_w))
    plus = F.when(
        pair_live,
        elem_fields(
            F.col("__t"), 0, F.lit(0),
            [(gap <= F.lit(w)).cast("long") for w in horizons.values()], null_p,
        ),
    )
    # -1 one tick past the inclusive activity bound a+w, so P(t) is a pure
    # range-frame cumulative sum over (time) — see module docstring.
    minuses = [
        F.when(
            F.col("__prev").isNotNull() & (gap <= F.lit(w_us)),
            elem_fields(
                F.col("__prev") + F.lit(w_us + 1), 2, F.lit(0),
                [F.lit(-1 if c2 == c else 0) for c2 in d_cols], null_p,
            ),
        )
        for (s, w_us), c in zip(horizons.items(), d_cols)
    ]
    # Dead elements are exploded as NULL rows and dropped by a flat filter
    # rather than compacted with the array ``filter`` higher-order function:
    # HOF lambdas are evaluated outside whole-stage codegen, and this
    # expression runs once per input row on the hot path.
    u = (
        pre.select(
            "__e",
            F.explode(F.array(query_elem, plus, *minuses)).alias("__ev"),
        )
        .where(F.col("__ev").isNotNull())
        .select(
            "__e",
            F.col("__ev.t").alias("__time"),
            F.col("__ev.k").alias("__kind"),
            F.col("__ev.c").alias("__c"),
            *[F.col(f"__ev.{c}").alias(c) for c in d_cols],
            F.col("__ev.p").alias("__p"),
        )
    )

    # Every frame is a growing range frame over the single (entity, time)
    # ordering -> one sort, one WindowExec for the whole family (module
    # docstring, v4 shape).
    w_cum = Window.partitionBy("__e").orderBy("__time").rangeBetween(
        Window.unboundedPreceding, 0
    )
    out_cols = {}
    for (s, w_us), c in zip(horizons.items(), d_cols):
        w_before = Window.partitionBy("__e").orderBy("__time").rangeBetween(
            Window.unboundedPreceding, -w_us - 1
        )
        c_in_window = F.sum("__c").over(w_cum) - F.coalesce(
            F.sum("__c").over(w_before), F.lit(0)
        )
        out_cols[f"{out_prefix}_{s}"] = c_in_window - F.sum(c).over(w_cum)
    u = u.withColumns(out_cols)

    filtered = u.where(F.col("__kind") == 1)
    if epoch_col is None:
        return filtered.select(
            *[F.col("__p")[c].alias(c) for c in payload_cols],
            *[F.col(n).alias(n) for n in out_cols],
        )
    # Alias-aware output: __e/__time carry the hash-partitioning and the
    # (entity, time) sort order through to downstream window operators.
    return filtered.select(
        F.col("__e").alias(entity_col),
        F.col("__time").alias(epoch_col),
        *[F.col("__p")[c].alias(c) for c in payload_cols],
        *[F.col(n).alias(n) for n in out_cols],
    )
