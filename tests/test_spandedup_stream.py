"""Streaming substring-level dedup: arrival-order semantics, python
differential, and exact replay idempotence (the batch-id-keyed gram store).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from retailfeaturestore_spark.streaming.spandedup_stream import (
    scrub_batch_repeated_spans,
    span_scrub_stream,
)

N = 8
BOILER = "the quick brown fox jumps over the lazy sleeping dog"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _python_scrub(batches, n=N):
    """Independent arrival-order recomputation: position p of batch k is
    duplicate iff its gram was seen in batches < k or occurs >= 2 times in
    batch k; overlapping duplicate positions merge into spans."""
    seen: set[str] = set()
    out: dict[int, str] = {}
    for rows in batches:
        batch_grams: dict[str, int] = {}
        per_doc = {}
        for doc_id, text in rows:
            ws = text.split(" ")
            gs = [
                hashlib.md5(" ".join(ws[i : i + n]).encode()).hexdigest()
                for i in range(len(ws) - n + 1)
            ]
            per_doc[doc_id] = (ws, gs)
            for g in gs:
                batch_grams[g] = batch_grams.get(g, 0) + 1
        for doc_id, (ws, gs) in per_doc.items():
            dup_pos = {
                i
                for i, g in enumerate(gs)
                if g in seen or batch_grams[g] >= 2
            }
            covered = set()
            for i in dup_pos:
                covered.update(range(i, i + n))
            out[doc_id] = " ".join(
                w for i, w in enumerate(ws) if i not in covered
            )
        seen.update(batch_grams)
    return out


def test_batch_scrub_matches_python_and_is_replay_exact(spark, tmp_path):
    u = [" ".join(f"u{b}w{i}" for i in range(10)) for b in range(3)]
    batches = [
        [(1, f"{u[0]} {BOILER}")],                     # first sight: kept
        [(2, f"{BOILER} {u[1]}"), (3, u[1] + " tail1 tail2")],  # cross + within
        [(4, BOILER)],                                  # fully duplicated
    ]
    state = str(tmp_path / "grams")
    want = _python_scrub(batches)
    got = {}
    for k, rows in enumerate(batches):
        res = scrub_batch_repeated_spans(_docs(spark, rows), state, k, n=N)
        got.update({r.doc_id: r.clean_text for r in res.collect()})
    assert got == want
    # batch 1's boiler was first sight -> kept; batch 2+ scrubbed
    assert BOILER in got[1] and BOILER not in got[2] and got[4] == ""
    # doc 2 vs doc 3: u[1] occurs in BOTH docs of batch 2 -> both scrubbed
    assert "u1w0" not in got[2] and "u1w0" not in got[3]

    # EXACT replay: re-running batch 1 (state already appended) recomputes
    # identical decisions — its own grams are invisible to the < k probe
    replay = {
        r.doc_id: r.clean_text
        for r in scrub_batch_repeated_spans(
            _docs(spark, batches[1]), state, 1, n=N
        ).collect()
    }
    assert replay == {2: got[2], 3: got[3]}
    # and appended nothing: the store's distinct grams are unchanged
    grams = spark.read.parquet(state)
    assert grams.count() == grams.select("gram").distinct().count()


def test_span_scrub_stream_equals_batch_driver(spark, tmp_path):
    """The foreachBatch wrapper over staged micro-batches produces exactly
    the sequential batch-function results, one appended file set per
    batch."""
    from conftest import stage_microbatches

    batches = [
        [(1, f"{BOILER} alpha0 alpha1 alpha2")],
        [(2, f"beta0 beta1 {BOILER}")],
    ]
    stream = stage_microbatches(
        spark, tmp_path, "doc_id long, text string", batches
    )
    state = str(tmp_path / "grams")
    out_dir = str(tmp_path / "scrubbed")
    q = span_scrub_stream(
        stream, state, out_dir, n=N, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.clean_text, r.batch_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = _python_scrub(batches)
    assert {d: t for d, (t, _) in got.items()} == want
    assert got[1][1] == 0 and got[2][1] == 1
    assert BOILER in got[1][0] and got[2][0] == "beta0 beta1"


def test_state_uri_scheme_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="URI scheme"):
        scrub_batch_repeated_spans(
            _docs(spark, [(1, "a b c")]), "s3a://bucket/grams", 0
        )
