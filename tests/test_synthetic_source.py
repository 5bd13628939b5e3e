"""Spark 4 streaming Python DataSource: deterministic synthetic events."""

from __future__ import annotations

import pytest

from retailfeaturestore_spark.sources.events_stream_source import (
    SyntheticEventsDataSource,
    _SyntheticEventsStreamReader,
)


def _run_bounded(spark, name: str):
    df = (
        spark.readStream.format("rfs_synthetic_events")
        .option("rowsPerBatch", "50")
        .option("maxRows", "120")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return [tuple(r) for r in spark.sql(f"select * from {name} order by event_id").collect()]


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_bounded_stream_is_deterministic_across_runs(spark):
    """maxRows terminates processAllAvailable; two independent runs emit
    identical data (the exactly-once fixture contract)."""
    spark.dataSource.register(SyntheticEventsDataSource)
    a = _run_bounded(spark, "synth_a")
    b = _run_bounded(spark, "synth_b")
    assert len(a) == 120
    assert a == b
    assert {r[3] for r in a} == {"view", "click", "purchase", "signup", "error"}
    # event-time spacing: 1s steps from the configured epoch
    assert (a[1][1] - a[0][1]).total_seconds() == 1.0


def test_recovery_replay_equals_original_batch():
    """readBetweenOffsets must regenerate EXACTLY the planned batch — the
    determinism Spark's recovery path relies on."""
    r = _SyntheticEventsStreamReader({"rowsPerBatch": "7", "maxRows": "100"})
    start = r.initialOffset()
    it, nxt = r.read(start)
    original = list(it)
    assert nxt == {"index": 7} and len(original) == 7
    replay = list(r.readBetweenOffsets(start, nxt))
    assert replay == original
    # exhaustion: same offset back means "no new data"
    it2, same = r.read({"index": 100})
    assert list(it2) == [] and same == {"index": 100}


def test_synthetic_source_drives_stateful_operator(spark):
    """Composition: the synthetic stream feeds applyInPandasWithState and
    the converged totals equal a batch recomputation over the same
    deterministic rows — a full streaming differential test with no files
    and no Kafka."""
    import pyspark.sql.functions as F

    from retailfeaturestore_spark.sources.events_stream_source import _row
    from retailfeaturestore_spark.streaming.stateful import running_user_totals

    spark.dataSource.register(SyntheticEventsDataSource)
    stream = (
        spark.readStream.format("rfs_synthetic_events")
        .option("rowsPerBatch", "40")
        .option("maxRows", "100")
        .option("nUsers", "7")
        .load()
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("synth_totals")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {
        r.user_id: r
        for r in spark.table("synth_totals")
        .withColumn("__i", F.monotonically_increasing_id())
        .orderBy("__i")
        .collect()
    }
    rows = [_row(i, 7, 1, 1704067200) for i in range(100)]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    expected = {
        r.user_id: r
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100)) / 100.0).alias("value_sum"),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for uid, exp in expected.items():
        assert final[uid].n_events == exp.n_events, uid
        assert abs(final[uid].value_sum - exp.value_sum) < 1e-9, uid
