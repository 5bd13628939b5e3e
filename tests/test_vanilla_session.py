"""Regression guard for session-dependence (the round-1 driver failure).

The correctness driver executes ``queries()`` under its OWN vanilla
SparkSession — none of ``session.get_spark()``'s configs apply.  Round 1
lost 17/50 driver queries to exactly that: nanosecond parquet timestamps
failing the scan (PARQUET_TYPE_ILLEGAL) and TIMESTAMP_NTZ breaking
``unix_micros``.  This test re-runs a representative query per failure
class through ``tools/check_vanilla.py`` in a SUBPROCESS — a fresh JVM is
essential, because ``getOrCreate`` inside this pytest process would inherit
the engine session's confs and hide the bug.

The full 73-query sweep is ``python tools/check_vanilla.py`` (run it before
release); this guard keeps the suite fast while covering every failure
mode: ns-timestamp scan, NTZ epoch arithmetic, NTZ window frames, as-of
union typing, and the streaming batch-equivalent path.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

# One representative per round-1 failure class.
PROBE_QUERIES = [
    "feature_view_build",       # NTZ epoch in range-frame windows
    "latest_event_per_user",    # events ns-timestamp scan
    "asof_snapshot_lookup",     # events scan + as-of window
    "churn_labels_orders",      # NTZ in interval-existence union
    "order_sequence_analytics", # NTZ in lag/lead arithmetic
    "events_session_windows",   # streaming batch-equivalent path
]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_queries_run_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_vanilla.py"), SF_DIR]
        + PROBE_QUERIES,
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        "queries failed under a vanilla (driver-like) SparkSession:\n"
        + proc.stdout[-4000:]
        + proc.stderr[-2000:]
    )
