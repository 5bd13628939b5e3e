"""Streaming KMV maintenance: streamed state == batch sketch of the full
prefix (md5 determinism), replay idempotence (semilattice merge), and
live overlap estimates off the state.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from retailfeaturestore_spark.operators.sketches import (
    kmv_group_sketch,
    kmv_pair_overlap,
)
from retailfeaturestore_spark.streaming.sketch_stream import (
    read_kmv_state,
    update_kmv_batch,
    kmv_sketch_stream,
)

from conftest import stage_microbatches

_SCHEMA = "g string, v long"
K = 32


def _batches():
    # three batches, overlapping value sets across two groups; > K distinct
    # per group overall so truncation genuinely happens
    return [
        [("a", v) for v in range(0, 60)] + [("b", v) for v in range(40, 80)],
        [("a", v) for v in range(30, 90)] + [("b", v) for v in range(60, 120)],
        [("a", v) for v in range(85, 140)] + [("b", v) for v in range(0, 20)],
    ]


def _full_sketch(spark, batches):
    rows = [r for b in batches for r in b]
    df = spark.createDataFrame(rows, _SCHEMA)
    return {
        (r.g, r.h)
        for r in kmv_group_sketch(df, "g", "v", k=K)
        .select(F.col("g"), "h")
        .collect()
    }


def test_streamed_state_equals_batch_sketch_of_full_prefix(spark, tmp_path):
    state_dir = str(tmp_path / "kmv_state")
    batches = _batches()
    for i, rows in enumerate(batches):
        update_kmv_batch(
            spark.createDataFrame(rows, _SCHEMA), state_dir, "g", "v", k=K
        )
        got = {(r.g, r.h) for r in read_kmv_state(spark, state_dir).collect()}
        want = _full_sketch(spark, batches[: i + 1])
        assert got == want, f"after batch {i}"


def test_replay_is_idempotent_without_a_ledger(spark, tmp_path):
    state_dir = str(tmp_path / "kmv_replay")
    batches = _batches()
    for rows in batches:
        update_kmv_batch(
            spark.createDataFrame(rows, _SCHEMA), state_dir, "g", "v", k=K
        )
    before = {(r.g, r.h) for r in read_kmv_state(spark, state_dir).collect()}
    # replay the LAST batch (at-least-once crash signature): semilattice
    # merge must leave the state bit-identical
    update_kmv_batch(
        spark.createDataFrame(batches[-1], _SCHEMA), state_dir, "g", "v", k=K
    )
    after = {(r.g, r.h) for r in read_kmv_state(spark, state_dir).collect()}
    assert after == before


def test_mtable_backend_equals_dir_backend_and_time_travels(spark, tmp_path):
    from retailfeaturestore_spark.sources.mtable import MTable
    from retailfeaturestore_spark.streaming.sketch_stream import (
        read_kmv_state_mtable,
        update_kmv_batch_mtable,
    )

    tbl = MTable(spark, str(tmp_path / "kmv_mt"))
    batches = _batches()
    versions = []
    for rows in batches:
        versions.append(
            update_kmv_batch_mtable(
                spark.createDataFrame(rows, _SCHEMA), tbl, "g", "v", k=K
            )
        )
    assert versions == [1, 2, 3]
    # final state == batch sketch of the full prefix (same as dir backend)
    got = {(r.g, r.h) for r in read_kmv_state_mtable(tbl).collect()}
    assert got == _full_sketch(spark, batches)
    # SKETCH TIME TRAVEL: state as of batch i == sketch of prefix i
    for i, v in enumerate(versions):
        asof = {(r.g, r.h) for r in read_kmv_state_mtable(tbl, version=v).collect()}
        assert asof == _full_sketch(spark, batches[: i + 1]), f"version {v}"
    # ledger-free replay: re-folding the last batch commits a NEW version
    # with bit-identical content (semilattice idempotence)
    v4 = update_kmv_batch_mtable(
        spark.createDataFrame(batches[-1], _SCHEMA), tbl, "g", "v", k=K
    )
    assert v4 == 4
    replayed = {(r.g, r.h) for r in read_kmv_state_mtable(tbl).collect()}
    assert replayed == got


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_foreachbatch_stream_and_live_overlap_estimates(spark, tmp_path):
    state_dir = str(tmp_path / "kmv_stream_state")
    stream = stage_microbatches(spark, tmp_path, _SCHEMA, _batches())
    q = kmv_sketch_stream(
        stream,
        state_dir,
        "g",
        "v",
        k=K,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    state = read_kmv_state(spark, state_dir)
    assert {(r.g, r.h) for r in state.collect()} == _full_sketch(
        spark, _batches()
    )
    # live overlap estimate off the maintained state: groups a and b share
    # values 40..79 and 85..119 etc. — just assert the estimator runs and
    # matches the batch-side estimator on the same sketch rows
    pairs = spark.createDataFrame([("a", "b")], "group_a string, group_b string")
    got = kmv_pair_overlap(state, pairs, "g", k=K).collect()[0]
    full = spark.createDataFrame(
        [r for b in _batches() for r in b], _SCHEMA
    )
    want = kmv_pair_overlap(
        kmv_group_sketch(full, "g", "v", k=K).select(F.col("g"), "h"),
        pairs,
        "g",
        k=K,
    ).collect()[0]
    assert (got.ku, got.union_est, got.inter_est) == (
        want.ku,
        want.union_est,
        want.inter_est,
    )


def test_swap_crash_between_renames_recovers_on_read(spark, tmp_path):
    # ADVICE r9: a crash between rename(state, trash) and rename(next,
    # state) left NO state dir, so replay re-merged into EMPTY state and
    # silently lost every prior batch.  read_kmv_state now recovers a
    # surviving complete _next_ (preferred) else _trash_ directory.
    import os

    sd = str(tmp_path / "kmv_state")
    b1, b2 = _batches()[:2]
    update_kmv_batch(spark.createDataFrame(b1, _SCHEMA), sd, "g", "v", k=K)
    before = {(r.g, r.h) for r in read_kmv_state(spark, sd).collect()}
    assert before

    # simulate the crash window: state renamed aside, next fully written
    inc = kmv_group_sketch(spark.createDataFrame(b2, _SCHEMA), "g", "v", k=K)
    nxt = f"{sd}_next_99999"
    inc.select(F.col("g").cast("string").alias("g"), "h").write.parquet(nxt)
    os.rename(sd, f"{sd}_trash_99999")
    assert not os.path.isdir(sd)

    # recovery prefers the complete _next_ snapshot
    got = {(r.g, r.h) for r in read_kmv_state(spark, sd).collect()}
    exp = {
        (r.g, r.h)
        for r in kmv_group_sketch(
            spark.createDataFrame(b2, _SCHEMA), "g", "v", k=K
        ).collect()
    }
    assert got == exp
    # replaying both batches converges to the full-prefix sketch
    update_kmv_batch(spark.createDataFrame(b1, _SCHEMA), sd, "g", "v", k=K)
    update_kmv_batch(spark.createDataFrame(b2, _SCHEMA), sd, "g", "v", k=K)
    assert {(r.g, r.h) for r in read_kmv_state(spark, sd).collect()} == _full_sketch(
        spark, [b1, b2]
    )
    # the successful updates swept the stale survivors
    import glob

    assert not glob.glob(f"{sd}_next_*") and not glob.glob(f"{sd}_trash_*")


def test_swap_crash_trash_only_recovers_old_state(spark, tmp_path):
    import os

    sd = str(tmp_path / "kmv_state2")
    b1 = _batches()[0]
    update_kmv_batch(spark.createDataFrame(b1, _SCHEMA), sd, "g", "v", k=K)
    before = {(r.g, r.h) for r in read_kmv_state(spark, sd).collect()}
    os.rename(sd, f"{sd}_trash_4242")  # crash right after the first rename
    got = {(r.g, r.h) for r in read_kmv_state(spark, sd).collect()}
    assert got == before


def test_null_values_never_consume_sketch_slots(spark):
    # ADVICE r9: kmv_hash(NULL) is NULL; Spark orders NULLs FIRST asc so a
    # (g, NULL) row survived both tournament windows, wasting a slot and
    # diverging from DuckDB's NULLS-LAST ordering.
    rows = [("a", v) for v in range(50)] + [("a", None)] * 7 + [("b", None)] * 3
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_group_sketch(df, "g", "v", k=K).collect()
    assert all(r.h is not None for r in sk)
    # group b had ONLY nulls -> empty sketch, no phantom row
    assert {r.g for r in sk} == {"a"}
    # with k=32 < 50 distinct, the k slots hold 32 real hashes (the null
    # used to displace the k-th smallest and bias the estimate)
    assert sum(1 for r in sk if r.g == "a") == K
