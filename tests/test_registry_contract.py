"""Driver-contract invariants over the query registry itself: these are the
assumptions the correctness driver (and the bench) build on, pinned so a
refactor cannot silently break the evaluation window."""

from __future__ import annotations

import bench
from retailfeaturestore_spark.queries import DRIVER_PRIORITY, REGISTRY


def test_window_is_exactly_50_unique_known_names():
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, missing


def test_window_holds_no_unhashable_sketches():
    """approx-tagged queries can never fully hash-match (engine-specific
    sketches) — they must not burn evaluated-window slots."""
    first50 = list(REGISTRY)[:50]
    assert first50 == list(DRIVER_PRIORITY)
    offenders = [n for n in first50 if "approx" in REGISTRY[n].tags]
    assert not offenders, offenders


def test_every_query_has_an_oracle():
    """Every registered query carries a DuckDB oracle, except the
    explicitly allowed non-SQL-expressible set (iterative algorithms the
    driver checks rows-only and pytest checks by differential)."""
    # iterative BPE merge learning; order-dependent FFD greedy bin state —
    # both pytest-differential-verified, neither SQL-expressible
    ALLOWED_NO_ORACLE = {"bpe_token_count", "seq_packing_ffd"}
    no_oracle = [
        n for n, qd in REGISTRY.items()
        if not qd.oracle and n not in ALLOWED_NO_ORACLE
    ]
    assert not no_oracle, no_oracle


def test_bench_headline_names_resolve():
    unknown = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not unknown, unknown
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
