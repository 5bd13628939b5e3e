"""Composed streaming corpus ingest (streaming/corpus_stream.py):
admission decisions must match the batch gates doc-for-doc (near-dup state
carried ACROSS micro-batches, static decontamination reference, Gopher +
held-out-source per-doc gates), and the staged->packed output must equal a
batch pack of the same admitted docs."""

from __future__ import annotations

import pytest

import glob
import os
import uuid

from pyspark.sql import functions as F

from retailfeaturestore_spark.operators.packing import pack_chunk_text
from retailfeaturestore_spark.streaming.corpus_stream import (
    build_benchmark_ref,
    pack_admitted_stream,
    streaming_corpus_admission,
)

from conftest import stage_microbatches

SCHEMA = "doc_id long, text string, source string"
BENCH = "the held out benchmark suite and the secret eval questions live here"

# the admitted docs share STOPWORDS but no 3-gram shingles — lexically
# distinct enough that only the planted exact copy is a near-dup
D1 = "the quick brown fox and the lazy dog jumps over wooden fences today"
D2 = "the silver market report and the annual revenue figures arrive next quarter"
D5 = "the garden tomato plants and the basil seedlings need careful watering soon"
D7 = "the mountain railway line and the coastal ferry route reopen during spring"
D8 = "the library reading group and the chess club share meeting rooms weekly"

DOCS = [
    # batch 1
    (0, BENCH, "src0"),                      # held-out source: excluded + ref
    (1, D1, "src1"),                         # admitted
    (2, D2, "src2"),                         # admitted
    # batch 2
    (3, D1, "src1"),                         # exact copy of d1 -> near-dup
    (4, BENCH + " plus tail", "src1"),       # contaminated vs the ref
    (5, D5, "src2"),                         # admitted
    (6, "tiny doc here", "src1"),            # fails word-count gate
    # batch 3
    (7, D7, "src1"),                         # admitted
    (8, D8, "src2"),                         # admitted
]
ADMITTED = [1, 2, 5, 7, 8]


def _run_admission(spark, tmp_path):
    work = str(tmp_path / "corpus")
    static = spark.createDataFrame(DOCS, SCHEMA)
    ref = build_benchmark_ref(static, heldout_source="src0")
    stream = stage_microbatches(
        spark, tmp_path, SCHEMA, [DOCS[:3], DOCS[3:7], DOCS[7:]]
    )
    q = streaming_corpus_admission(
        stream, work, benchmark_ref=ref, heldout_source="src0", min_words=5
    )
    q.awaitTermination(180)
    return work


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_admission_gates_and_cross_batch_neardup(spark, tmp_path):
    work = _run_admission(spark, tmp_path)
    dec = {
        r.doc_id: r for r in spark.read.parquet(os.path.join(work, "decisions")).collect()
    }
    assert sorted(dec) == list(range(9))
    assert [d for d in sorted(dec) if dec[d].kept == 1] == ADMITTED
    # the near-dup was caught ACROSS batches by the accumulated state
    assert dec[3].is_neardup and dec[3].batch_id == 1
    assert not dec[1].is_neardup
    # one staged file per batch, zero-padded listing order == batch order
    staged = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(work, "admitted", "batch-*.parquet"))
    )
    assert staged == [f"batch-{i:09d}.parquet" for i in range(3)]
    # staged rows are exactly the admitted docs
    adm = spark.read.parquet(os.path.join(work, "admitted")).collect()
    assert sorted(r.doc_id for r in adm) == ADMITTED


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_staged_pack_equals_batch_pack_of_admitted(spark, tmp_path):
    work = _run_admission(spark, tmp_path)
    name = f"cp_{uuid.uuid4().hex[:8]}"
    q = (
        pack_admitted_stream(
            spark, work, max_tokens=16, n_shards=2,
            flush_tail=True, files_per_trigger=None,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.shard, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in spark.table(name).collect()
    }
    admitted_df = spark.createDataFrame(
        [(i, t) for i, t, s in DOCS if i in ADMITTED], "doc_id long, text string"
    )
    want = {
        (r.shard, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in pack_chunk_text(admitted_df, max_tokens=16, n_shards=2).collect()
    }
    assert got == want and len(got) > 0


def test_empty_text_doc_gets_audit_row_not_silence(spark, tmp_path):
    """Audit completeness: an empty-text doc must appear in decisions with
    kept=0 (review finding: the old length>0 pre-filter made it vanish)."""
    rows = [(0, D1, "src1"), (1, "", "src1"), (2, None, "src2")]
    work = str(tmp_path / "c2")
    stream = stage_microbatches(spark, tmp_path, SCHEMA, [rows])
    q = streaming_corpus_admission(stream, work, min_words=5)
    q.awaitTermination(120)
    dec = {r.doc_id: r.kept for r in spark.read.parquet(os.path.join(work, "decisions")).collect()}
    assert dec == {0: 1, 1: 0, 2: 0}


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_stage2_schema_guard_refuses_mismatched_columns(spark, tmp_path):
    import pytest

    work = _run_admission(spark, tmp_path)
    with pytest.raises(ValueError, match="lack column"):
        pack_admitted_stream(spark, work, id_col="id", text_col="body")
