"""Composed streaming corpus ingest: admission -> staging -> packing.

The streaming analogue of ``jobs.build_packed_corpus``: documents arrive as
micro-batches and flow through TWO chained streaming stages, staged through
files (the standard pattern for chaining stateful stages that need different
state mechanisms — the admission state is a foreachBatch-managed parquet
store, the packer tail is ``applyInPandasWithState``):

  stage 1 (``streaming_corpus_admission``, foreachBatch):
      near-dup admission against the ACCUMULATED band/posting store
      (``streaming/neardup_stream.ingest_batch_neardup`` — the streaming
      replacement for the batch job's canonical-copy dedup, strictly
      stronger: it catches near-dups, not just byte-copies) + the per-doc
      gates of ``operators/curation.judge_corpus_admission`` (Gopher
      quality flags, held-out-source exclusion, shingle-overlap
      decontamination vs a STATIC benchmark reference).  Per-doc decisions
      append to ``work_dir/decisions`` (the audit trail); admitted
      (doc_id, text) rows stage to ``work_dir/admitted`` as ONE file per
      batch with a batch-derived mtime, so the downstream file source
      (which orders by modification time) replays them in arrival order.

  stage 2 (``pack_admitted_stream``):
      file stream over the staging dir -> the cross-batch incremental
      packer (``streaming_pack_chunks``) -> completed fixed-length
      training rows, identical to a batch ``pack_chunk_text`` over the
      same admitted docs in the same order (the packer's certified
      replay-determinism property).

Decontamination reference: at 100 TB the benchmark shingle set is a static
artifact built once from the held-out corpus (here: a DataFrame argument);
building it per batch from the batch itself would silently stop
decontaminating.  Staging contract: one file per batch via a local-FS
rename (same mechanism as the test harness and the packed-shard sink's
marker-last protocol); on object stores, stage through a per-batch
directory + manifest or a log-compacted topic instead.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import GOPHER_FLAGS
from ..operators.textops import gopher_quality
from ..functions.text import shingles
from .neardup_stream import ingest_batch_neardup

__all__ = [
    "build_benchmark_ref",
    "streaming_corpus_admission",
    "pack_admitted_stream",
]


def build_benchmark_ref(
    docs: DataFrame, heldout_source: str = "src0", shingle_n: int = 3
) -> DataFrame:
    """The static decontamination reference: distinct shingles of the
    held-out source.  Build ONCE (driver job), pass to the stream.
    Materialized eagerly (localCheckpoint) — a lazy frame would re-run the
    held-out scan + explode + distinct on EVERY micro-batch's broadcast,
    turning the 'static artifact' into a per-batch job."""
    return (
        docs.where(F.col("source") == heldout_source)
        .select(F.explode(shingles(F.col("text"), shingle_n)).alias("sh"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _stage_one_file(df: DataFrame, stage_dir: str, batch_id: int) -> None:
    """Write df as exactly one parquet file per batch, with a batch-derived
    strictly-increasing mtime — the property the downstream FileStreamSource
    actually orders by (names are for humans; the utime pin is the order
    contract)."""
    tmp = os.path.join(stage_dir, f"_tmp-{batch_id}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    (part,) = glob.glob(os.path.join(tmp, "*.parquet"))
    os.makedirs(stage_dir, exist_ok=True)
    dst = os.path.join(stage_dir, f"batch-{batch_id:09d}.parquet")
    os.replace(part, dst)
    # FileStreamSource orders new files by MODIFICATION TIME, not name, and
    # os.replace preserves the part file's original mtime — two quick
    # batches can tie on coarse-granularity filesystems and replay out of
    # order into the order-sensitive packer.  Pin a strictly-increasing
    # mtime derived from the batch id so the source's timestamp sort IS the
    # batch order.
    t = 1_000_000_000 + batch_id
    os.utime(dst, (t, t))
    shutil.rmtree(tmp)


def streaming_corpus_admission(
    docs_stream: DataFrame,
    work_dir: str,
    benchmark_ref: DataFrame | None = None,
    heldout_source: str = "src0",
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    neardup_threshold: float = 0.5,
    min_words: int = 50,
):
    """Stage 1: start the admission stream.  Returns the StreamingQuery.

    Per micro-batch: near-dup admission against the accumulated state
    (``work_dir/neardup_state``), Gopher per-doc gates, held-out-source
    exclusion, decontamination vs ``benchmark_ref``.  Appends the full
    decision frame (doc_id, source, kept + reason flags, batch_id) to
    ``work_dir/decisions``; stages admitted (doc_id, text) rows to
    ``work_dir/admitted`` one file per batch.
    """
    state_dir = os.path.join(work_dir, "neardup_state")
    decisions_dir = os.path.join(work_dir, "decisions")
    admitted_dir = os.path.join(work_dir, "admitted")
    checkpoint_dir = os.path.join(work_dir, "checkpoint_admission")
    os.makedirs(admitted_dir, exist_ok=True)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        # every input doc gets an audit row — empty/null text is NOT
        # pre-filtered (it fails the word-count gate and records kept=0;
        # silently vanishing docs would break audit reconciliation).
        b = batch_df.withColumn(
            text_col, F.coalesce(F.col(text_col), F.lit(""))
        ).localCheckpoint()
        nd = ingest_batch_neardup(
            b, state_dir, text_col=text_col, id_col=id_col,
            threshold=neardup_threshold,
        ).select(F.col("doc_id").alias(id_col), "is_neardup")
        flags = gopher_quality(
            b, text_col=text_col, id_col=id_col,
            min_words=min_words, carry_cols=("source", text_col),
        )
        kept = (~F.col("is_neardup")) & (F.col("source") != heldout_source)
        for flag in GOPHER_FLAGS:
            kept = kept & (F.col(flag) == 1)
        if benchmark_ref is not None:
            sh = b.select(
                F.col(id_col),
                F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
            )
            contam = (
                sh.join(
                    F.broadcast(benchmark_ref.withColumn("__hit", F.lit(1))),
                    "sh",
                    "left",
                )
                .groupBy(id_col)
                .agg(
                    F.count(F.lit(1)).alias("__n_sh"),
                    F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                    .cast("long")
                    .alias("__n_hit"),
                )
            )
            flags = flags.join(contam, id_col, "left")
            kept = kept & (
                F.lit(2) * F.coalesce(F.col("__n_hit"), F.lit(0))
                < F.coalesce(F.col("__n_sh"), F.lit(1))
            )
        decided = (
            flags.join(nd, id_col)
            .withColumn("kept", kept.cast("int"))
            .withColumn("batch_id", F.lit(batch_id))
            .localCheckpoint()
        )
        decided.drop(text_col).write.mode("append").parquet(decisions_dir)
        admitted = decided.where(F.col("kept") == 1).select(id_col, text_col)
        _stage_one_file(admitted, admitted_dir, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def pack_admitted_stream(
    spark: SparkSession,
    work_dir: str,
    max_tokens: int = 512,
    n_shards: int = 8,
    flush_tail: bool = False,
    files_per_trigger: int | None = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stage 2: the packed-chunk stream over the staging dir.  Attach a
    sink and trigger (availableNow for drain-and-stop).  One staged file
    per trigger (the default) preserves batch order for the packer's
    cross-batch tail; ``files_per_trigger=None`` drains everything staged
    in one trigger — pair it with ``flush_tail=True`` for the final
    close-the-corpus run (flush closes the tail at EVERY trigger, so it
    belongs only on a last/one-shot drain).  ``id_col``/``text_col`` must
    match what the admission stage staged — parquet reads of ABSENT
    columns return nulls rather than erroring, so a name mismatch would
    silently feed the packer empty rows."""
    from .packing_stream import streaming_pack_chunks

    staged = os.path.join(work_dir, "admitted")
    if glob.glob(os.path.join(staged, "batch-*.parquet")):
        have = set(spark.read.parquet(staged).columns)
        missing = {id_col, text_col} - have
        if missing:
            raise ValueError(
                f"staged files at {staged!r} lack column(s) {sorted(missing)} "
                f"(have {sorted(have)}): pass the id_col/text_col the "
                "admission stage staged with"
            )
    reader = spark.readStream.schema(f"{id_col} long, {text_col} string")
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(staged)
    return streaming_pack_chunks(
        stream, max_tokens=max_tokens, n_shards=n_shards,
        text_col=text_col, id_col=id_col, flush_tail=flush_tail,
    )
