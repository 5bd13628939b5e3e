"""Streaming KMV sketch maintenance — distinct-count SET ALGEBRA over an
unbounded stream.

Maintains the per-group k-minimum-values sketch (``operators/sketches``)
across micro-batches: each batch's sketch is merged into the stored state
by ``k-min(state UNION batch)``.  Any moment's state answers distinct
counts AND cross-group union/jaccard/intersection estimates
(``kmv_pair_overlap``) — the streaming audience-overlap / cross-cohort
monitor, with O(groups x k) state regardless of stream length.

Exactness without a ledger: the merge is a JOIN-SEMILATTICE —
``merge(S, S) = S`` (idempotent), commutative, associative, and
``k-min(k-min(X) UNION Y) = k-min(X UNION Y)`` (truncation is a lattice
homomorphism: every element of the k smallest of ``X UNION Y`` that comes
from ``X`` is necessarily among the k smallest of ``X``).  So an
at-least-once foreachBatch REPLAY re-merges a batch already folded in and
the state is bit-identical — no batch-id bookkeeping needed, unlike the
gram store's strict ``batch_id < k`` protocol (the hashes are md5 of the
values: pure data functions, so the streamed state equals the BATCH
sketch of the stream's full prefix exactly, which is what the
differential tests assert).

State swap uses the same directory-rename protocol as the gram-store
compactor: write the merged state aside, rename the old store to trash,
rename the new one in.  A crash between the two renames leaves NO state
dir but BOTH complete side dirs (``_next_`` holds the fully-written new
state — Spark's ``_SUCCESS`` marker proves it; ``_trash_`` holds the old
one), so :func:`read_kmv_state` RECOVERS: it renames a surviving
``_next_`` (preferred — it already folded the batch) else ``_trash_``
back into place before reading.  Either recovery converges under
at-least-once replay by the semilattice idempotence argument above.
Single-writer per state dir, like every state-dir operation here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sketches import kmv_group_sketch

__all__ = [
    "update_kmv_batch",
    "kmv_sketch_stream",
    "read_kmv_state",
    "update_kmv_batch_mtable",
    "read_kmv_state_mtable",
]

_STATE_SCHEMA = "g string, h long"


def _recover_state_dir(state_dir: str) -> None:
    """If the state dir is absent, restore it from a swap-crash survivor.

    The only moment the dir legitimately does not exist mid-stream is the
    window between ``rename(state, trash)`` and ``rename(next, state)`` in
    :func:`update_kmv_batch` — a crash there strands one ``_next_<pid>``
    (complete iff Spark's ``_SUCCESS`` marker landed) and one
    ``_trash_<pid>``.  Prefer the newest complete ``_next_`` (the batch is
    already folded in; a replay re-merges idempotently), else the newest
    ``_trash_`` (pre-batch state; the replay folds the batch back in)."""
    import glob

    if os.path.isdir(state_dir):
        return
    nexts = [
        d
        for d in glob.glob(f"{state_dir}_next_*")
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    trashes = [d for d in glob.glob(f"{state_dir}_trash_*") if os.path.isdir(d)]
    for cand in sorted(nexts, key=os.path.getmtime, reverse=True) + sorted(
        trashes, key=os.path.getmtime, reverse=True
    ):
        try:
            os.rename(cand, state_dir)
            return
        except OSError:  # lost a recovery race; state_dir now exists
            if os.path.isdir(state_dir):
                return


def read_kmv_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current sketch state as ``(g, h)`` rows — feed straight into
    ``kmv_pair_overlap(state, pairs, "g", k=...)`` for live overlap
    estimates, or ``groupBy(g).count()`` + the KMV estimator for distinct
    counts."""
    if "://" in state_dir:
        raise ValueError(
            f"state path {state_dir!r} has a URI scheme — the parquet "
            "directory sketch store is local-filesystem only; use the "
            "mtable backend (update_kmv_batch_mtable / "
            "read_kmv_state_mtable) for object-store state"
        )
    _recover_state_dir(state_dir)
    if os.path.isdir(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        return spark.read.schema(_STATE_SCHEMA).parquet(state_dir)
    return spark.createDataFrame([], _STATE_SCHEMA)


def update_kmv_batch(
    batch: DataFrame,
    state_dir: str,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> None:
    """Fold one micro-batch into the sketch store:
    ``state' = k-min(state UNION sketch(batch))`` per group.

    Plain batch function so the foreachBatch wrapper and the tests drive
    the identical code path.  Cost: the batch sketch build (map-side
    distinct + tournament over the BATCH only) plus a window over
    O(groups x 2k) combined sketch rows — the unbounded stream never
    reaccumulates."""
    import shutil

    spark = batch.sparkSession
    inc = kmv_group_sketch(batch, group_col, value_col, k=k).select(
        F.col(group_col).cast("string").alias("g"), "h"
    )
    state = read_kmv_state(spark, state_dir)
    merged = state.unionByName(inc).distinct()
    w = Window.partitionBy("g").orderBy("h")
    new = (
        merged.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )
    tmp = f"{state_dir}_next_{os.getpid()}"
    new.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(state_dir):
        trash = f"{state_dir}_trash_{os.getpid()}"
        os.rename(state_dir, trash)
        os.rename(tmp, state_dir)
        shutil.rmtree(trash, ignore_errors=True)
    else:
        os.rename(tmp, state_dir)
    # sweep any OTHER survivors of an earlier crash (this writer already
    # recovered/merged past them via read_kmv_state) so a future recovery
    # can never resurrect a stale snapshot over a newer state
    import glob

    for stale in glob.glob(f"{state_dir}_next_*") + glob.glob(
        f"{state_dir}_trash_*"
    ):
        shutil.rmtree(stale, ignore_errors=True)


def read_kmv_state_mtable(tbl, version: int | None = None) -> DataFrame:
    """The mtable-backed sketch state as ``(g, h)`` rows.  ``version``
    gives SKETCH TIME TRAVEL: the per-group distinct/overlap estimates AS
    OF any committed batch — a capability the parquet-directory backend
    cannot offer (each swap destroys the previous state)."""
    from ..sources.mtable import NoSuchVersion

    try:
        df = tbl.read(version=version)
    except NoSuchVersion:
        return tbl.spark.createDataFrame([], _STATE_SCHEMA)
    return df.select("g", "h") if df is not None else tbl.spark.createDataFrame(
        [], _STATE_SCHEMA
    )


def update_kmv_batch_mtable(
    batch: DataFrame,
    tbl,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> int:
    """The mtable-backed fold: same semilattice merge as
    :func:`update_kmv_batch`, committed as a snapshot-isolated mtable
    version (``write(mode="overwrite")`` — the state is O(groups x k), so
    a full rewrite per batch is the cheap, always-consistent choice).

    What the lakehouse backend buys over the parquet-directory swap:

    - **object-store safe**: the commit is one manifest PUT, not a
      directory rename — this closes the dir backend's documented
      local-filesystem-only caveat;
    - **racing-writer safety**: two streams folding into one table
      serialize through the manifest CAS instead of corrupting a swap;
    - **sketch time travel**: every batch's state is a retained version —
      ``read_kmv_state_mtable(tbl, version=n)`` answers "what was the
      distinct-user overlap as of batch n" (vacuum prunes the horizon);
    - replay is STILL ledger-free: the semilattice merge makes a replayed
      batch commit a new version with bit-identical content.

    Returns the committed version."""
    from pyspark.sql import Window

    spark = batch.sparkSession
    inc = kmv_group_sketch(batch, group_col, value_col, k=k).select(
        F.col(group_col).cast("string").alias("g"), "h"
    )
    state = read_kmv_state_mtable(tbl)
    merged = state.unionByName(inc).distinct()
    w = Window.partitionBy("g").orderBy("h")
    new = (
        merged.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )
    # the merge reads the CURRENT state and the write replaces it, so the
    # rows must be computed before the commit swaps the file list
    new = new.localCheckpoint(eager=True)
    return tbl.write(new, mode="overwrite")


def kmv_sketch_stream(
    stream: DataFrame,
    state_dir: str,
    group_col: str,
    value_col: str,
    k: int = 256,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Continuous sketch maintenance over a stream: every micro-batch
    advances the per-group KMV state; readers query ``read_kmv_state``
    between (or during) triggers for live distinct/overlap estimates."""

    def step(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if batch_df.isEmpty():
            return
        update_kmv_batch(batch_df, state_dir, group_col, value_col, k=k)

    writer = stream.writeStream.foreachBatch(step)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
