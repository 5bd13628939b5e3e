"""Structured Streaming: file-source replay must equal the batch formulation,
and the watermark must bound state (late-arrival drop behavior)."""

from __future__ import annotations

import shutil
import uuid

from retailfeaturestore_spark.streaming.events_stream import (
    batch_equivalent_counts,
    read_events_stream,
    stream_to_memory,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_replay_equals_batch(spark, tmp_path):
    # file-source streams read a DIRECTORY; stage the table into one
    stage = tmp_path / "events_stream"
    stage.mkdir()
    shutil.copy(f"{SF}/events.parquet", stage / "part-0.parquet")
    stream = read_events_stream(spark, str(stage))
    assert stream.isStreaming
    result = windowed_event_counts(stream, window="1 day", watermark="1 hour")
    name = f"evt_{uuid.uuid4().hex[:8]}"
    # complete mode: append would (correctly) hold back the final window,
    # whose end the watermark never passes on a finite replay
    q = stream_to_memory(result, name, output_mode="complete")
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum, r.n_errors)
        for r in spark.table(name).collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum, r.n_errors)
        for r in batch_equivalent_counts(spark, SF).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0
