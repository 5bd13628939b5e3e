"""applyInPandasWithState: running per-user totals must survive across
micro-batches and converge to the batch aggregation."""

from __future__ import annotations

import pytest

import shutil
import uuid

from pyspark.sql import functions as F

from retailfeaturestore_spark.streaming.stateful import running_user_totals

from conftest import requires_testdata

pytestmark = requires_testdata

SF = "/root/testdata/sf0.001"


def test_running_totals_converge_to_batch(spark, tmp_path):
    # stage the events into TWO files so maxFilesPerTrigger=1 yields two
    # micro-batches -> state must carry over
    from retailfeaturestore_spark.io import load_table

    ev = load_table(spark, SF, "events").select("user_id", "ts", "value")
    stage = tmp_path / "stream"
    ev.where("event_id % 2 = 0").coalesce(1).write.parquet(str(stage / "a"))
    ev.where("event_id % 2 = 1").coalesce(1).write.parquet(str(stage / "b"))
    import glob as g
    import os
    files = sorted(g.glob(str(stage / "*" / "*.parquet")))
    for i, f in enumerate(files):
        shutil.move(f, str(stage / f"part-{i}.parquet"))
    for d in ("a", "b"):
        shutil.rmtree(str(stage / d))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    name = f"totals_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # memory sink in update mode appends each batch's emissions: take the
    # LAST emission per user
    final = {
        r.user_id: r
        for r in spark.table(name)
        .withColumn("__i", F.monotonically_increasing_id())
        .orderBy("__i")
        .collect()
    }
    expected = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100)) / 100.0).alias("value_sum"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for uid, exp in expected.items():
        got = final[uid]
        assert got.n_events == exp.n_events, uid
        assert abs(got.value_sum - exp.value_sum) < 1e-9, uid
        assert got.last_ts == exp.last_ts, uid


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_streaming_funnel_replay_equals_batch(spark, tmp_path):
    """Two in-order micro-batches (split at the median event time) through
    the stateful funnel must converge to the batch funnel operator's stage
    times for every user."""
    import uuid

    from retailfeaturestore_spark.io import load_table
    from retailfeaturestore_spark.operators.funnel import funnel_stage_times
    from retailfeaturestore_spark.streaming.funnel_stream import (
        FUNNEL_STAGES,
        streaming_funnel_stages,
    )

    ev = load_table(spark, SF, "events").select("user_id", "ts", "event_type")
    # Inject a null-timestamp event for an existing user into BOTH engines:
    # the stateful funnel must drop it (a NaT once crashed the micro-batch
    # permanently, ADVICE r4), matching the batch operator's tolerance.
    some_uid = ev.limit(1).collect()[0].user_id
    null_row = spark.createDataFrame(
        [(some_uid, None, "view")], "user_id long, ts timestamp, event_type string"
    )
    ev = ev.unionByName(null_row)
    cutoff = ev.selectExpr("percentile(cast(ts as double), 0.5) as c").collect()[0].c
    stage = tmp_path / "funnel_stream"
    # split BY EVENT TIME so each user's events arrive in order across
    # batches — the regime where the bounded-state funnel is exact
    # (the null-ts row rides in the first file: cast(null) <= cutoff is
    # NULL -> filtered, so place it explicitly)
    ev.where(F.col("ts").cast("double") <= cutoff).unionByName(null_row).coalesce(
        1
    ).write.parquet(str(stage), mode="append")
    ev.where(F.col("ts").cast("double") > cutoff).coalesce(1).write.parquet(
        str(stage), mode="append"
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_funnel_stages(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {
        r.user_id: r
        for r in spark.table(name)
        .withColumn("__i", F.monotonically_increasing_id())
        .orderBy("__i")
        .collect()
    }
    expected = {r.user_id: r for r in funnel_stage_times(ev, FUNNEL_STAGES).collect()}
    assert set(final) == set(expected)
    for uid, exp in expected.items():
        got = final[uid]
        assert got.stage_view == exp.stage_view, uid
        assert got.stage_click == exp.stage_click, uid
        assert got.stage_purchase == exp.stage_purchase, uid
