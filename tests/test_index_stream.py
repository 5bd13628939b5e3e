"""Streaming PQ index maintenance: streamed appends must produce the SAME
index as batch build+append, replays must converge, partial id overlap must
fail loudly."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from retailfeaturestore_spark.io import load_table
from retailfeaturestore_spark.operators.similarity import (
    build_pq_index,
    load_pq_index,
)
from retailfeaturestore_spark.streaming.index_stream import pq_append_stream

from conftest import requires_testdata, stage_microbatches

pytestmark = requires_testdata

SF = "/root/testdata/sf0.001"
SCHEMA = "vec_id long, embedding array<float>"


def _rows(emb, lo, hi):
    return [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(f"vec_id >= {lo} and vec_id < {hi}").collect()
    ]


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_streamed_appends_equal_batch_index(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "pq_idx")
    build_pq_index(emb.where(F.col("vec_id") < 300), idx, m=4, k_codes=8, iters=2)

    batches = [_rows(emb, 300, 380), _rows(emb, 380, 450), _rows(emb, 450, 10_000)]
    stream = stage_microbatches(spark, tmp_path, SCHEMA, batches)
    q = pq_append_stream(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    _, codes, meta = load_pq_index(spark, idx)
    assert codes.count() == emb.count()
    assert meta["appended_batches"] == 3
    # streamed codes == a batch re-encode under the same frozen codebooks:
    # rebuild a reference index from the same base, append everything at once
    idx2 = str(tmp_path / "pq_idx_ref")
    from retailfeaturestore_spark.operators.similarity import append_pq_index

    build_pq_index(emb.where(F.col("vec_id") < 300), idx2, m=4, k_codes=8, iters=2)
    append_pq_index(spark, idx2, emb.where(F.col("vec_id") >= 300))
    _, codes2, _ = load_pq_index(spark, idx2)
    a = {(int(r["id"]), tuple(int(c) for c in r["__codes"])) for r in codes.collect()}
    b = {(int(r["id"]), tuple(int(c) for c in r["__codes"])) for r in codes2.collect()}
    assert a == b


def test_full_replay_is_noop_partial_overlap_fails(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "pq_idx")
    build_pq_index(emb.where(F.col("vec_id") < 400), idx, m=4, k_codes=8, iters=2)

    batch = spark.createDataFrame(_rows(emb, 400, 450), SCHEMA)
    from retailfeaturestore_spark.operators.similarity import append_pq_index

    append_pq_index(spark, idx, batch)
    _, codes, _ = load_pq_index(spark, idx)
    n = codes.count()

    # replay the SAME batch through the streaming step: converges as a no-op
    stream = stage_microbatches(spark, tmp_path, SCHEMA, [_rows(emb, 400, 450)])
    q = pq_append_stream(stream, idx, str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    _, codes, meta = load_pq_index(spark, idx)
    assert codes.count() == n
    assert meta["appended_batches"] == 1  # the replay did not bump the counter

    # partial overlap (one old id + one new) is a producer bug -> loud
    mixed = _rows(emb, 449, 460)
    stream2 = stage_microbatches(spark, tmp_path / "s2", SCHEMA, [mixed])
    q2 = pq_append_stream(stream2, idx, str(tmp_path / "ckpt3"))
    with pytest.raises(Exception, match="already exist"):
        q2.awaitTermination(120)
        raise RuntimeError("stream should have failed")
