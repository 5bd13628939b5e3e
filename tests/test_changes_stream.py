"""Change-feed consumer (streaming a table) + RESTORE semantics.

Covers: the Trigger.AvailableNow drain loop with version-batch bounding,
exactly-once into an mtable sink via the ledger riding the sink's own
atomic commit (crash-before-checkpoint replays are SKIPPED), and RESTORE
as an O(manifest) commit whose change-feed delta exactly un-does what it
reverts.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from retailfeaturestore_spark.sources.mtable import MTable, NoSuchVersion
from retailfeaturestore_spark.streaming.changes_stream import (
    ChangeFeedConsumer,
    mtable_append_sink,
)


def _snap(spark, rows):
    return spark.createDataFrame(
        rows, "customer_id long, t_ref string, score double"
    ).withColumn("t_ref", F.col("t_ref").cast("timestamp"))


def _with_date(df):
    return df.withColumn("date", F.date_format("t_ref", "yyyy-MM-dd"))


BASE = [
    (1, "2024-01-01 10:00:00", 1.0),
    (2, "2024-01-01 11:00:00", 2.0),
    (3, "2024-01-02 10:00:00", 3.0),
]

APPEND = [
    (4, "2024-01-03 10:00:00", 4.0),
    (5, "2024-01-03 11:00:00", 5.0),
]


def _mk4(spark, tmp_path, name="src"):
    t = MTable(spark, str(tmp_path / name))
    t.write(_with_date(_snap(spark, BASE)), partition_by="date")
    t.write(_with_date(_snap(spark, APPEND)), mode="append")
    t.delete(F.col("customer_id") == 2)
    t.update(F.col("customer_id") == 3, {"score": F.lit(30.0)})
    return t


def _rows(df):
    return {(r.customer_id, r.score, r.date) for r in df.collect()}


# -- restore ----------------------------------------------------------------


def test_restore_rolls_back_state_without_rewriting_files(spark, tmp_path):
    t = _mk4(spark, tmp_path)
    v1_rows = _rows(t.read(version=1))
    v1_files = set(t.read(version=1).inputFiles())
    assert t.restore(1) == 5
    assert _rows(t.read()) == v1_rows
    # O(manifest): the restored snapshot plans the ORIGINAL v1 files
    assert set(t.read().inputFiles()) == v1_files
    assert t.history()[-1]["operation"] == "restore"
    # time travel still reaches the undone commits
    assert {r.customer_id for r in t.read(version=4).collect()} == {1, 3, 4, 5}
    # restoring the current version is a no-op
    assert t.restore(5) == 5


def test_restore_nets_to_zero_in_the_feed(spark, tmp_path):
    t = _mk4(spark, tmp_path)
    t.restore(1)
    feed = t.read_changes(1)  # v2..v5: everything done, then undone
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    net = (
        feed.groupBy("customer_id", "score", "date")
        .agg(F.sum(sign).alias("net"))
        .where(F.col("net") != 0)
    )
    assert net.count() == 0
    # and the restore commit alone is the exact inverse of v1..v4's delta
    inv = {
        (r.customer_id, r.score, r.date): r.net
        for r in t.read_changes(4, 5)
        .groupBy("customer_id", "score", "date")
        .agg(F.sum(sign).alias("net"))
        .where(F.col("net") != 0)
        .collect()
    }
    fwd = {
        (r.customer_id, r.score, r.date): r.net
        for r in t.read_changes(1, 4)
        .groupBy("customer_id", "score", "date")
        .agg(F.sum(sign).alias("net"))
        .where(F.col("net") != 0)
        .collect()
    }
    assert inv == {k: -v for k, v in fwd.items()}


def test_restore_guards(spark, tmp_path):
    t = MTable(spark, str(tmp_path / "empty"))
    with pytest.raises(NoSuchVersion):
        t.restore(1)
    t.write(_with_date(_snap(spark, BASE)), partition_by="date")
    with pytest.raises(NoSuchVersion):
        t.restore(7)


# -- consumer ----------------------------------------------------------------


def _signed_date_counts(feed):
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    return feed.groupBy("date").agg(F.sum(sign).cast("long").alias("n"))


def _dest_counts(dest):
    return {
        r.date: r.n
        for r in dest.read()
        .groupBy("date")
        .agg(F.sum("n").alias("n"))
        .where(F.col("n") != 0)
        .collect()
    }


def test_consumer_exactly_once_rollup(spark, tmp_path):
    src = _mk4(spark, tmp_path)
    dest = MTable(spark, str(tmp_path / "rollup"))
    process, ledger = mtable_append_sink(dest, transform=_signed_date_counts)
    c = ChangeFeedConsumer(
        src, str(tmp_path / "ckpt"), max_versions_per_batch=2, ledger=ledger
    )
    ranges = c.run_available(process)
    assert ranges == [(0, 2), (2, 4)]
    want = {
        r.date: r.n
        for r in src.read().groupBy("date").agg(F.count("*").alias("n")).collect()
    }
    assert _dest_counts(dest) == want
    # drained: nothing to do
    assert c.run_available(process) == []
    # crash-before-checkpoint: losing the cursor file must NOT double-apply
    # — the ledger rode the sink's own commits
    os.remove(os.path.join(str(tmp_path / "ckpt"), "processed_through"))
    assert c.processed_through() == 4
    assert c.run_available(process) == []
    assert _dest_counts(dest) == want
    # new upstream commit -> one more batch, state stays consistent
    src.delete(F.col("customer_id") == 1)
    assert c.run_available(process) == [(4, 5)]
    want = {
        r.date: r.n
        for r in src.read().groupBy("date").agg(F.count("*").alias("n")).collect()
    }
    assert _dest_counts(dest) == want


def test_lost_cursor_with_vacuumed_ledger_refuses_to_refeed(spark, tmp_path):
    src = _mk4(spark, tmp_path)
    dest = MTable(spark, str(tmp_path / "sink"))
    process, ledger = mtable_append_sink(dest, transform=_signed_date_counts)
    c = ChangeFeedConsumer(src, str(tmp_path / "ckpt"), ledger=ledger)
    c.run_available(process)
    # a commit WITHOUT the ledger key (manual backfill/maintenance) then
    # aggressive vacuum: every ledger-carrying manifest is gone
    dest.write(
        spark.createDataFrame([("2024-01-09", 0)], "date string, n long"),
        mode="append",
    )
    dest.vacuum(keep_versions=1, min_age_ms=0)
    assert ledger() is None and dest._latest() is not None
    # cursor intact: normal operation continues (nothing new -> no-op)
    assert c.run_available(process) == []
    # cursor lost on top: the ambiguous state must refuse, not re-feed
    os.remove(os.path.join(str(tmp_path / "ckpt"), "processed_through"))
    with pytest.raises(RuntimeError, match="double every row"):
        c.processed_through()
    n = dest.read().count()
    with pytest.raises(RuntimeError):
        c.run_available(process)
    assert dest.read().count() == n  # nothing re-fed


def test_consumer_horizon_loss_is_a_loud_operator_error(spark, tmp_path):
    src = _mk4(spark, tmp_path)
    c = ChangeFeedConsumer(src, str(tmp_path / "ckpt"), max_versions_per_batch=2)
    c.run_available(lambda df, a, b: None)
    # vacuum past the cursor... then new commits arrive
    src.delete(F.col("customer_id") == 1)
    src.vacuum(keep_versions=1, min_age_ms=0)
    src.write(
        _with_date(_snap(spark, [(7, "2024-01-07 10:00:00", 7.0)])),
        mode="append",
    )
    # cursor 4, retained history starts at 5: the delta is uncomputable
    c2 = ChangeFeedConsumer(src, str(tmp_path / "ckpt_lag"))
    c2._write_ckpt(3)  # a consumer that lagged behind the vacuum horizon
    import pytest as _pytest
    from retailfeaturestore_spark.sources.mtable import NoSuchVersion

    with _pytest.raises(NoSuchVersion, match="vacuum outran"):
        c2.run_available(lambda df, a, b: None)


def test_consumer_version_batching_and_bootstrap(spark, tmp_path):
    src = _mk4(spark, tmp_path)
    seen: list[tuple[int, int]] = []
    c = ChangeFeedConsumer(
        src, str(tmp_path / "ckpt1"), max_versions_per_batch=1
    )
    ranges = c.run_available(lambda df, a, b: seen.append((a, b)))
    # v_from=0 bootstraps: the first batch is v1's initial content as inserts
    assert ranges == [(0, 1), (1, 2), (2, 3), (3, 4)] == seen
    assert c.processed_through() == 4


def test_consumer_sails_through_respec_and_migrate(spark, tmp_path):
    """Partition spec evolution must be invisible to a netting feed
    consumer: the respec commit emits no events, the post-respec append
    flows normally, and migrate()'s row-preserving churn nets to zero in
    the signed rollup."""
    src = MTable(spark, str(tmp_path / "src_respec"))
    src.write(_with_date(_snap(spark, BASE)), partition_by="date")
    dest = MTable(spark, str(tmp_path / "rollup_respec"))
    process, ledger = mtable_append_sink(dest, transform=_signed_date_counts)
    c = ChangeFeedConsumer(src, str(tmp_path / "ckpt_respec"), ledger=ledger)
    c.run_available(process)

    src.repartition_table("customer_id")  # metadata-only: no events
    src.write(
        _with_date(_snap(spark, [(6, "2024-01-04 10:00:00", 6.0)])),
        mode="append",
    )
    src.migrate()  # row-preserving churn: nets to zero downstream
    c.run_available(process)
    want = {
        r.date: r.n
        for r in src.read().groupBy("date").agg(F.count("*").alias("n")).collect()
    }
    assert _dest_counts(dest) == want
    # nothing left to drain, and the cursor sits at the migrate commit
    assert c.run_available(process) == []
    assert c.processed_through() == src.versions()[-1]


def test_continuous_trigger_interleaved_commits_exactly_once(spark, tmp_path):
    """VERDICT r10 next-round #7: the ProcessingTime-trigger mode
    (run_continuous) consumes upstream commits that land BOTH mid-drain
    (a writer racing the current cycle) and between trigger cycles,
    exactly once each, across 3+ cycles, through the same transactional
    sink ledger as run_available."""
    src = MTable(spark, str(tmp_path / "csrc"))
    src.write(_with_date(_snap(spark, BASE)), partition_by="date")
    dest = MTable(spark, str(tmp_path / "cdest"))
    process, ledger = mtable_append_sink(dest, transform=_signed_date_counts)
    c = ChangeFeedConsumer(
        src, str(tmp_path / "cckpt"), max_versions_per_batch=1, ledger=ledger
    )

    batches: list[tuple[int, int]] = []

    def proc(feed, v0, v1):
        if not batches:
            # upstream commit lands WHILE cycle 1 is draining v1: the same
            # drain must extend to it (run_available re-reads latest per
            # iteration), not wait for the next trigger
            src.write(_with_date(_snap(spark, APPEND)), mode="append")
        batches.append((v0, v1))
        process(feed, v0, v1)

    injections = iter(
        [
            lambda: src.delete(F.col("customer_id") == 2),
            lambda: src.update(F.col("customer_id") == 3, {"score": F.lit(30.0)}),
        ]
    )

    def stop_when():
        nxt = next(injections, None)
        if nxt is None:
            return True  # all interleavings landed and drained: stop
        nxt()  # commit between trigger cycles
        return False

    cycles = c.run_continuous(proc, poll_interval_s=0.0, stop_when=stop_when)
    # cycle 1 drained v1 AND the mid-drain v2; cycles 2 and 3 each drained
    # one between-cycle commit
    assert cycles == [[(0, 1), (1, 2)], [(2, 3)], [(3, 4)]]
    assert batches == [(0, 1), (1, 2), (2, 3), (3, 4)]
    # state equals the full recompute: every commit applied exactly once
    want = {
        r.date: r.n
        for r in src.read().groupBy("date").agg(F.count("*").alias("n")).collect()
    }
    assert _dest_counts(dest) == want
    # the ledger rode each batch's sink commit: cursor survives file loss
    os.remove(os.path.join(str(tmp_path / "cckpt"), "processed_through"))
    assert c.processed_through() == 4
    # idle continuous run: 2 cycles, no batches, no sink commits
    v_dest = dest.versions()
    idle = c.run_continuous(proc, poll_interval_s=0.0, max_cycles=2)
    assert idle == [[], []]
    assert dest.versions() == v_dest
