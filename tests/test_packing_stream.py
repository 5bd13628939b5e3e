"""Incremental streaming packer (streaming/packing_stream.py): replayed
micro-batches must produce EXACTLY the batch operator's chunks when
delivery is in doc_id order, state must carry partial tails across
batches, and the tail flush must close the last chunk."""

from __future__ import annotations

import pytest

import uuid

from retailfeaturestore_spark.operators.packing import pack_chunk_text
from retailfeaturestore_spark.streaming.packing_stream import streaming_pack_chunks

from conftest import stage_microbatches

MAX_TOKENS = 32
N_SHARDS = 2

DOCS = [
    (0, "a " * 9 + "end"),
    (1, "b " * 45 + "end"),
    (2, "c " * 70 + "end"),
    (3, "d"),
    (4, "e f g"),
    (5, "h " * 31 + "end"),
    (6, "i " * 20 + "end"),
    (7, "j " * 55 + "end"),
]
SCHEMA = "doc_id long, text string"


def _rows():
    return [(i, t.strip()) for i, t in DOCS]


def _run_stream(spark, tmp_path, flush_tail=False):
    # three micro-batches in doc_id order — the replay-determinism
    # convention under which stream == batch exactly
    rows = _rows()
    stream = stage_microbatches(
        spark, tmp_path, SCHEMA, [rows[:3], rows[3:6], rows[6:]]
    )
    name = f"pack_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_pack_chunks(
            stream, max_tokens=MAX_TOKENS, n_shards=N_SHARDS, flush_tail=flush_tail
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).collect()


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_stream_pack_equals_batch_full_chunks(spark, tmp_path):
    got = {
        (r["shard"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in _run_stream(spark, tmp_path)
    }
    batch = pack_chunk_text(
        spark.createDataFrame(_rows(), SCHEMA), max_tokens=MAX_TOKENS, n_shards=N_SHARDS
    ).collect()
    batch_full = {
        (r["shard"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in batch
        if r["n_tokens"] == MAX_TOKENS
    }
    # every completed stream chunk == the batch chunk at the same position
    assert got == batch_full
    # and state really carried across batches: there are completed chunks
    # whose content spans documents from different micro-batches
    assert any(n == MAX_TOKENS for (_, n) in got.values())


def test_stream_pack_flush_tail_closes_corpus(spark, tmp_path):
    """flush_tail is the final-drain mode (it closes the tail at each
    micro-batch end, so it belongs on the LAST run over the remaining
    corpus): one flushed batch over everything == the batch pack exactly,
    including the short final chunk per shard."""
    rows = _rows()
    stream = stage_microbatches(spark, tmp_path, SCHEMA, [rows])
    name = f"pack_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_pack_chunks(
            stream, max_tokens=MAX_TOKENS, n_shards=N_SHARDS, flush_tail=True
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name).collect()
    batch = pack_chunk_text(
        spark.createDataFrame(rows, SCHEMA), max_tokens=MAX_TOKENS, n_shards=N_SHARDS
    ).collect()
    assert sum(r["n_tokens"] for r in got) == sum(r["n_tokens"] for r in batch)
    stream_all = {(r["shard"], r["chunk_id"]): r["chunk_text"] for r in got}
    batch_all = {(r["shard"], r["chunk_id"]): r["chunk_text"] for r in batch}
    assert stream_all == batch_all
