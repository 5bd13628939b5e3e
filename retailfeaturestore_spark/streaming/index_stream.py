"""Streaming ANN index maintenance: micro-batch appends to a persisted PQ
index.

The serving-side complement of the corpus ingest stream: vectors arrive as
micro-batches and each batch is encoded against the FROZEN codebooks and
appended to the index (``operators/similarity.append_pq_index``) — search
sees every previously-committed batch with zero downtime, and the codebook
rebuild stays a scheduled batch job at a versioned path
(``build_pq_index``).

At-least-once semantics: ``append_pq_index``'s duplicate-id guard makes a
replayed batch (a foreachBatch retry AFTER its parquet append committed)
fail loudly instead of silently double-inserting code rows for the same
search identity.  ``skip_duplicate_batches=True`` (the streaming default)
turns exactly that case into a no-op: a batch whose ids ALL already exist
is the at-least-once replay signature, and dropping it converges the
stream; a PARTIAL overlap is still an error (two producers sharing an id
range — a real bug, not a replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import append_pq_index, load_pq_index

__all__ = ["pq_append_stream"]


def pq_append_stream(
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    skip_duplicate_batches: bool = True,
):
    """Start the index-maintenance stream; returns the StreamingQuery.

    The index must already exist (``build_pq_index``) — appending into a
    missing index is refused per batch, same as the batch API.
    """

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if skip_duplicate_batches:
            spark = batch_df.sparkSession
            _, codes, _ = load_pq_index(spark, index_dir)
            ids = batch_df.select(F.col(id_col).alias("id")).distinct()
            n_ids = ids.count()
            n_existing = ids.join(codes.select("id"), "id", "left_semi").count()
            if n_existing == n_ids:
                return  # full replay of a committed batch — converged, skip
            # partial overlap falls through to append_pq_index's loud guard
        append_pq_index(
            batch_df.sparkSession, index_dir, batch_df,
            vec_col=vec_col, id_col=id_col,
        )

    return (
        vectors_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
