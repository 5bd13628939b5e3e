"""Streaming KMV maintenance: streamed state == batch sketch of the full
prefix (md5 determinism), replay idempotence (semilattice merge), and
live overlap estimates off the state.
"""

from __future__ import annotations

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
