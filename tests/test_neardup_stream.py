"""Incremental near-dup admission: streaming replay equals the batch
greedy-by-id dedup, and state accumulates across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from retailfeaturestore_spark.operators.dedup import (
    jaccard_pairs_exact,
    minhash_candidate_pairs,
    minhash_signatures,
    posting_lists,
)
from retailfeaturestore_spark.streaming.neardup_stream import (
    ingest_batch_neardup,
    neardup_ingest_stream,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank today"
)
DOCS = [
    (0, BASE),
    (1, BASE + " indeed"),  # near-dup of 0
    (2, "completely different text about spark shuffle partitions and joins"),
    (3, BASE.replace("quick", "swift")),  # near-dup of 0/1
    (4, "another unrelated document mentioning gradient descent optimizers"),
    (5, "completely different text about spark shuffle partitions and joins!"),  # dup of 2
    (6, "short"),  # too short to shingle: always admitted
]


def _batch_reference(spark):
    """Greedy-by-id batch rule: doc flagged iff a verified pair (a, b),
    a < b, exists; matched = min such a."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    posts = posting_lists(docs)
    sigs = minhash_signatures(None, postings=posts)
    cand = minhash_candidate_pairs(sigs)
    pairs = jaccard_pairs_exact(docs, candidates=cand, postings=posts)
    flagged = {
        int(r["doc_b"]): int(r["m"])
        for r in pairs.groupBy("doc_b").agg(F.min("doc_a").alias("m")).collect()
    }
    return flagged


def test_stream_replay_equals_batch_greedy(spark, tmp_path):
    flagged = _batch_reference(spark)
    assert flagged, "fixture must contain near-duplicates"

    # two micro-batches in id order (file source, one file per trigger)
    in_dir = tmp_path / "in"
    for name, rows in (("b0", DOCS[:3]), ("b1", DOCS[3:])):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(in_dir / name))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir / "*"))
    )
    q = neardup_ingest_stream(
        stream,
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        int(r["doc_id"]): (bool(r["is_neardup"]), r["matched_id"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert set(got) == {d[0] for d in DOCS}
    for doc_id, _ in DOCS:
        want_dup = doc_id in flagged
        assert got[doc_id][0] == want_dup, (doc_id, got[doc_id], flagged)
        if want_dup:
            assert got[doc_id][1] == flagged[doc_id]


def test_ingest_batch_core_cross_batch_witness(spark, tmp_path):
    """A doc admitted in batch 1 must reject its near-dup arriving in
    batch 2 (state actually accumulates), and the short unshingleable doc
    is admitted without error."""
    b1 = spark.createDataFrame(
        [(10, BASE), (11, "unrelated words about parquet row groups")],
        "doc_id long, text string",
    )
    d1 = {r["doc_id"]: r for r in ingest_batch_neardup(b1, str(tmp_path / "st")).collect()}
    assert not d1[10]["is_neardup"] and not d1[11]["is_neardup"]

    b2 = spark.createDataFrame(
        [(20, BASE + " truly"), (21, "tiny")], "doc_id long, text string"
    )
    d2 = {r["doc_id"]: r for r in ingest_batch_neardup(b2, str(tmp_path / "st")).collect()}
    assert d2[20]["is_neardup"] and d2[20]["matched_id"] == 10
    assert not d2[21]["is_neardup"] and d2[21]["matched_id"] is None


def test_replayed_batch_never_self_matches(spark, tmp_path):
    """At-least-once retry: re-admitting the same batch after its state
    append landed must not flag docs as duplicates of THEMSELVES; unique
    docs stay admitted on replay."""
    b = spark.createDataFrame(
        [(30, BASE), (31, "entirely distinct content on columnar shuffles")],
        "doc_id long, text string",
    )
    first = {r["doc_id"]: r for r in ingest_batch_neardup(b, str(tmp_path / "st")).collect()}
    assert not first[30]["is_neardup"] and not first[31]["is_neardup"]
    # replay the identical batch (state now contains these ids)
    again = {r["doc_id"]: r for r in ingest_batch_neardup(b, str(tmp_path / "st")).collect()}
    for did in (30, 31):
        assert again[did]["matched_id"] != did, "self-match on replay"
        assert not again[did]["is_neardup"]
