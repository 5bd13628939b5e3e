"""Randomized differential: the streaming event-time-timeout sessionizer
over in-order micro-batches must equal brute-force batch gap
sessionization for every session the final watermark closes."""

from __future__ import annotations

import pytest

import datetime
import random

from retailfeaturestore_spark.streaming.stateful import inactivity_sessions

from conftest import stage_microbatches

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
GAP_MIN = 30
GAP = datetime.timedelta(minutes=GAP_MIN)


def _brute_sessions(events):
    """events: list of (user, ts, value) -> closed+open sessions per user
    as (user, start, end, n, value_sum)."""
    out = []
    by_user = {}
    for u, ts, v in sorted(events, key=lambda e: (e[0], e[1])):
        by_user.setdefault(u, []).append((ts, v))
    for u, evs in by_user.items():
        cur = None
        for ts, v in evs:
            if cur is not None and ts > cur[1] + GAP:
                out.append((u, *cur))
                cur = None
            if cur is None:
                cur = [ts, ts, 0, 0.0]
            cur[1] = max(cur[1], ts)
            cur[2] += 1
            cur[3] += round(v * 100) / 100.0
        if cur is not None:
            out.append((u, *cur))
    return out


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_random_streams_equal_batch_sessionization(spark, tmp_path):
    rng = random.Random(20260814)
    events = []
    t = 0
    for _ in range(120):
        t += rng.choice([1, 3, 10, 45, 90])  # minutes; 45/90 force gaps
        events.append(
            (
                rng.randrange(6),
                T0 + datetime.timedelta(minutes=t),
                rng.randrange(1000) / 100.0,
            )
        )
    events.sort(key=lambda e: e[1])
    # split into 4 time-ordered micro-batches + a watermark pusher
    n = len(events)
    batches = [events[i * n // 4 : (i + 1) * n // 4] for i in range(4)]
    pusher_ts = events[-1][1] + datetime.timedelta(days=2)
    batches.append([(999, pusher_ts, 0.0)])

    schema = "user_id long, ts timestamp, value double"
    stream = stage_microbatches(spark, tmp_path, schema, batches)
    q = (
        inactivity_sessions(stream, gap_minutes=GAP_MIN, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sessions_rand")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.value_sum, 2))
        for r in spark.table("sessions_rand").collect()
        if r.user_id != 999
    }
    # the stream emits exactly the sessions the final watermark closes
    wm = pusher_ts - datetime.timedelta(minutes=1)
    want = {
        (u, s, e, cnt, round(vs, 2))
        for (u, s, e, cnt, vs) in _brute_sessions(events)
        if e + GAP < wm
    }
    assert got == want
    assert len(want) >= 20  # the fixture must actually exercise many sessions
