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

__all__ = ["upsert_latest", "table_diff"]


def upsert_latest(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    partition_col: str | None = None,
) -> int:
    """Merge ``updates`` into the table at ``table_path``: for each key,
    the row with the greatest (ts, tiebreak) wins.  Returns the row count
    after the merge.

    DEFAULT TARGET (r13, VERDICT r12 next-round #8): when ``table_path``
    is an existing ACID ``mtable`` (manifest directory present), the merge
    routes through :meth:`..sources.mtable.MTable.merge_upsert` — one
    atomic manifest commit, readers snapshot-isolated for the whole apply
    window.  Point NEW tables at an mtable (create with ``MTable.write``)
    to get that path; the plain-directory branch below remains for
    existing directory layouts and keeps its documented gap: a reader
    listing files during the staged overwrite can observe a partial
    partition swap (io.merge_upsert documents the same).  On the mtable
    route, an update row TIES with the stored row (equal ts and tiebreak)
    in favor of the UPDATE — deterministic and replay-idempotent, where
    the directory route's union + row_number resolves full ties by
    partition-order luck.

    First write (no existing table) degrades to a plain write.  With
    ``partition_col``, only the touched partitions are rewritten
    (``partitionOverwriteMode=dynamic``).
    """
    tb = tiebreak_col or ts_col
    from ..sources.mtable import MTable

    t = MTable(spark, table_path)
    if t.versions():
        # snapshot-isolated route: batch-local winners, then keep only the
        # update rows that beat (or miss) the stored row for their key —
        # merge_upsert replaces matched keys and appends new ones, all in
        # one manifest commit against the version read here
        cand = latest_per_key(updates, keys, ts_col, tb)
        ex = t.read().select(
            *keys,
            F.col(ts_col).alias("__ex_ts"),
            F.col(tb).alias("__ex_tb"),
        )
        beats = (
            F.col("__ex_ts").isNull()
            | (F.col(ts_col) > F.col("__ex_ts"))
            | (
                (F.col(ts_col) == F.col("__ex_ts"))
                & (F.col(tb) >= F.col("__ex_tb"))
            )
        )
        winners = (
            cand.join(ex, on=list(keys), how="left")
            .where(beats)
            .drop("__ex_ts", "__ex_tb")
        )
        pby = t._logical_pby(t._read_manifest(t.versions()[-1]))
        if pby is not None:
            # partitioned table: keyed merge rewrites only touched
            # partitions, one manifest commit
            pval = F.col(partition_col) if partition_col is not None else None
            t.merge_upsert(winners, keys=list(keys), partition_col_value=pval)
        else:
            # unpartitioned table: survivors + winners as one atomic
            # whole-table version (there is no partition grain to scope
            # the rewrite to — same cost as the directory route's full
            # overwrite, minus its reader-isolation gap)
            survivors = t.read().join(
                F.broadcast(winners.select(*keys).distinct()),
                on=list(keys),
                how="left_anti",
            )
            t.write(survivors.unionByName(winners.select(*survivors.columns)))
        return t.read().count()
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


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff between two versions of a table — the pipeline-regression
    audit that gates a gold-table publish: which keys were added, removed,
    or changed, and which columns changed.

    Returns one row per non-identical key: ``(*keys, change, changed_cols)``
    with ``change in ('added', 'removed', 'changed')`` and ``changed_cols``
    the sorted array of differing column names (empty for added/removed).
    Unchanged keys produce NO row, so the output is |delta|-sized, not
    |table|-sized.

    Precondition: the key is UNIQUE within each version (the contract of a
    keyed table; a NULL key component counts as a value and is matched
    null-safely).  Duplicate keys — including multiple NULL-keyed rows —
    make the full-outer join many-to-many and the classification
    undefined; run ``quality_checks.expect_unique_key`` first when the
    upstream does not guarantee it.

    Shape: ONE full-outer join on the key (both sides shuffle once, the
    standard co-partitioned diff); per-column comparison is null-safe
    (``<=>``) column algebra — no row serialization, no UDF.  At scale,
    bucket both versions by the key to elide the exchanges entirely
    (``io.write_bucketed_table``).
    """
    # `is None`, not truthiness: an explicit empty list means "classify
    # added/removed only" and must not auto-derive the shared columns.
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in set(keys)
        ]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in keys:
        # null-safe: a NULL key component must still match across versions
        # (plain == leaves both sides unmatched and reports a phantom
        # removed+added pair for an unchanged NULL-keyed row)
        eq = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
                for k in keys
            ],
            "change",
            F.when(F.col("change") == "changed", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )
