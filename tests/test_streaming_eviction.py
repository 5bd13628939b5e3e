"""Watermark-driven state eviction: event-time-timeout sessions and
outer stream-stream join null emission."""

from __future__ import annotations

import pytest

import datetime

from retailfeaturestore_spark.streaming.events_stream import (
    purchase_attribution_stream,
)
from retailfeaturestore_spark.streaming.stateful import inactivity_sessions

from conftest import stage_microbatches

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _m(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


_stage = stage_microbatches


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_inactivity_sessions_update_and_timeout_paths(spark, tmp_path):
    """Session A closes on the update path (a later event past the gap);
    session B and u2's session close on the EVENT-TIME TIMEOUT path once
    pusher events advance the watermark.  Open sessions never emit."""
    schema = "user_id long, ts timestamp, value double"
    stream = _stage(
        spark,
        tmp_path,
        schema,
        [
            [(1, _m(0), 1.0), (1, _m(5), 2.0), (2, _m(1), 3.0), (2, _m(10), 4.0)],
            [(1, _m(120), 5.0), (700, _m(24 * 60), 0.5)],
            [(701, _m(3 * 24 * 60), 0.25)],
        ],
    )
    q = (
        inactivity_sessions(stream, gap_minutes=30, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sessions_evict")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in spark.table("sessions_evict").collect()
    }
    assert (1, _m(0), _m(5), 2, 3.0) in got          # update-path close
    assert (1, _m(120), _m(120), 1, 5.0) in got      # timeout-path close
    assert (2, _m(1), _m(10), 2, 7.0) in got         # timeout-path close
    # first pusher's session also times out once the second pusher's event
    # advances the watermark past +1day+gap (the final timeout batch)
    assert (700, _m(24 * 60), _m(24 * 60), 1, 0.5) in got
    # the last event's own session can never time out -> still open
    assert not any(u == 701 for (u, *_) in got)
    assert len(got) == 4


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_outer_attribution_emits_watermark_certified_nulls(spark, tmp_path):
    """left_outer stream-stream join: an unattributed purchase appears
    with null click columns only after the watermark certifies no click
    can still arrive; attributed purchases match as in the inner join."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    stream = _stage(
        spark,
        tmp_path,
        schema,
        [
            [
                (10, _m(0), 1, "click", 0.0),
                (11, _m(10), 1, "purchase", 9.99),
                (12, _m(5), 2, "purchase", 5.0),  # no click for u2
            ],
            [
                (20, _m(24 * 60), 700, "click", 0.0),
                (21, _m(24 * 60 + 1), 700, "purchase", 7.0),
            ],
            [(30, _m(3 * 24 * 60), 701, "click", 0.0)],
        ],
    )
    q = (
        purchase_attribution_stream(stream, within="1 hour", how="left_outer")
        .writeStream.format("memory")
        .queryName("attr_outer")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.purchase_id: r for r in spark.table("attr_outer").collect()}
    assert rows[11].click_id == 10 and rows[11].user_id == 1
    assert rows[12].click_id is None and rows[12].click_ts is None
    assert rows[21].click_id == 20


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_inactivity_sessions_straggler_closes_as_singleton(spark, tmp_path):
    """A within-watermark late event more than a gap older than the
    pending session stays its own pending singleton (never merged) and
    both sessions emit once the watermark passes their end + gap."""
    schema = "user_id long, ts timestamp, value double"
    stream = _stage(
        spark,
        tmp_path,
        schema,
        [
            [(3, _m(120), 2.0)],
            [(3, _m(0), 1.0), (800, _m(2 * 24 * 60), 0.1)],  # straggler + pusher
            [(801, _m(4 * 24 * 60), 0.1)],
        ],
    )
    q = (
        inactivity_sessions(stream, gap_minutes=30, watermark="1 day")
        .writeStream.format("memory")
        .queryName("sessions_straggler")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in spark.table("sessions_straggler").collect()
        if r.user_id == 3
    }
    assert (3, _m(0), _m(0), 1, 1.0) in got      # straggler singleton
    assert (3, _m(120), _m(120), 1, 2.0) in got  # main session (timeout)
    assert len(got) == 2


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_late_events_merge_into_pending_session(spark, tmp_path):
    """The session_window-parity case: late within-watermark events that
    BRIDGE backward into a pending session merge into ONE session (no
    premature singleton splits) — emission is watermark-certified."""
    schema = "user_id long, ts timestamp, value double"
    stream = _stage(
        spark,
        tmp_path,
        schema,
        [
            [(5, _m(100), 1.0)],
            [(5, _m(65), 2.0), (5, _m(72), 4.0), (800, _m(3 * 24 * 60), 0.1)],
            [(801, _m(6 * 24 * 60), 0.1)],
        ],
    )
    q = (
        inactivity_sessions(stream, gap_minutes=30, watermark="1 day")
        .writeStream.format("memory")
        .queryName("sessions_merge")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in spark.table("sessions_merge").collect()
        if r.user_id == 5
    }
    assert got == {(5, _m(65), _m(100), 3, 7.0)}


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_right_outer_attribution_emits_abandoned_clicks(spark, tmp_path):
    """right_outer: a click with NO purchase in its window appears with
    null purchase columns only after the watermark certifies no purchase
    can still arrive (click_ts + within passed) — the abandoned-click
    funnel signal.  Unmatched purchases do NOT appear."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    stream = _stage(
        spark,
        tmp_path,
        schema,
        [
            [
                (10, _m(0), 1, "click", 0.0),
                (11, _m(10), 1, "purchase", 9.99),
                (12, _m(5), 2, "purchase", 5.0),   # no click for u2
                (13, _m(7), 3, "click", 0.0),      # u3 never purchases
            ],
            [
                (20, _m(24 * 60), 700, "click", 0.0),
                (21, _m(24 * 60 + 1), 700, "purchase", 7.0),
            ],
            [(30, _m(3 * 24 * 60), 701, "click", 0.0)],
        ],
    )
    q = (
        purchase_attribution_stream(stream, within="1 hour", how="right_outer")
        .writeStream.format("memory")
        .queryName("attr_right")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("attr_right").collect()
    by_click = {r.click_id: r for r in rows if r.click_id is not None}
    # matches keep full attribution
    assert by_click[10].purchase_id == 11 and by_click[10].user_id == 1
    assert by_click[20].purchase_id == 21
    # the abandoned click emits watermark-certified null purchase columns,
    # keyed by the CLICK side's user (the coalesce fix)
    assert by_click[13].purchase_id is None
    assert by_click[13].purchase_ts is None
    assert by_click[13].user_id == 3
    # unmatched PURCHASES never appear under right_outer
    assert all(r.purchase_id != 12 for r in rows)
    # the final batch's click (701) cannot be certified yet -> absent
    assert 30 not in by_click


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_full_outer_attribution_emits_both_certified_negatives(spark, tmp_path):
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    stream = _stage(
        spark,
        tmp_path,
        schema,
        [
            [
                (10, _m(0), 1, "click", 0.0),
                (11, _m(10), 1, "purchase", 9.99),
                (12, _m(5), 2, "purchase", 5.0),   # no click for u2
                (13, _m(7), 3, "click", 0.0),      # u3 never purchases
            ],
            # pusher batch advances BOTH sides' watermarks (each side's
            # watermark only moves on its own events), certifying batch 1
            [
                (20, _m(24 * 60), 700, "click", 0.0),
                (21, _m(24 * 60 + 1), 700, "purchase", 7.0),
            ],
            [
                (30, _m(3 * 24 * 60), 701, "click", 0.0),
                (31, _m(3 * 24 * 60), 702, "purchase", 1.0),
            ],
        ],
    )
    q = (
        purchase_attribution_stream(stream, within="1 hour", how="full_outer")
        .writeStream.format("memory")
        .queryName("attr_full")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("attr_full").collect()
    matched = sorted(
        (r.purchase_id, r.click_id)
        for r in rows
        if r.purchase_id is not None and r.click_id is not None
    )
    assert matched == [(11, 10), (21, 20)]
    # both certified-negative populations, each keyed by its own side
    no_click = {r.purchase_id: r for r in rows if r.click_id is None}
    no_purchase = {r.click_id: r for r in rows if r.purchase_id is None}
    assert no_click[12].user_id == 2 and no_click[12].click_ts is None
    assert no_purchase[13].user_id == 3 and no_purchase[13].purchase_ts is None
    # the final batch's rows can never certify -> absent from both sets
    assert 30 not in no_purchase and 31 not in no_click
