"""Range-partitioned global rank / prefix-sum / ntile — exact global-order
semantics without a single-partition WindowExec.

A partition-less ``Window.orderBy(...)`` moves EVERY row to one task —
correct at sf0.1, a scale-killer at the 10^8-10^9-entity north star (Spark
logs the "No Partition Defined for Window operation" warning for exactly
this reason).  The classic distributed alternative is the zipWithIndex
shape, expressed here in DataFrame ops so Catalyst/AQE keep planning it:

1. ``repartitionByRange`` on the ranking keys: each output partition holds
   a contiguous, non-overlapping key range (RangePartitioner boundaries
   come from per-partition reservoir sampling — where the boundaries fall
   affects balance only, never the computed ranks);
2. per-partition local rank / prefix sum via a window PARTITIONED by
   ``spark_partition_id()`` — parallel, never a global sort;
3. per-partition totals (one P-row aggregate, P = shuffle partitions)
   turned into exclusive offsets with a broadcast self-join — O(P^2)
   scalar pairs, deliberately NOT another global window (the module's
   plan test asserts zero partition-less WindowExec nodes end to end);
4. global value = partition offset + local value, broadcast-joined back
   on the partition id.

Everything any single task (or the driver) holds is O(P), independent of
row count.  The two consumers of the range exchange (the local window and
the per-partition totals) canonicalize identically, so the planner emits a
ReusedExchange — the data shuffles once.

Exactness domain: rank/tile arithmetic uses ``floor`` over IEEE division,
exact while row counts stay under 2^53 (9e15 rows — comfortably past the
100 TB design point).

Replaces the global windows the r6 review flagged in ``rfm_segments``,
``model_calibration_bins`` and ``ml/metrics.exact_auc``; reference parity:
the single-process engine sorts everything in memory anyway
(pandas ``sort_values`` in jobs/build_feature_views.py), so any faithful
distributed ranking is new surface, not a translation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["range_prefix_sum", "global_row_number", "exact_ntile"]

_PID = "__rp_pid"
_LOCAL = "__rp_local"
_PSUM = "__rp_psum"
_OFFSET = "__rp_offset"


def _num_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))


def range_prefix_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value: Column,
    out_col: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive prefix sum of ``value`` under the global
    ordering ``order_by``, computed with range-partitioned arithmetic (no
    single-partition window).

    Within ties of ``order_by`` the prefix is taken in an arbitrary
    per-partition order — pass a total order (unique tiebreak column) when
    per-row determinism matters; aggregate consumers that only read the
    prefix at tie-group boundaries (e.g. the AUC midrank sum groups by the
    ordering key first, so keys are unique) are safe either way.
    """
    n_part = num_partitions or _num_partitions(df)
    # Explicit partition count: AQE leaves user-pinned repartitions alone,
    # so both consumers below see the same partition ids even on replan.
    part = df.repartitionByRange(n_part, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn(_LOCAL, F.sum(value).over(w))
    sums = part.groupBy(_PID).agg(F.sum(value).alias(_PSUM))
    # Exclusive offsets over P rows via broadcast self-join (sum of all
    # earlier partitions' totals) — O(P^2) scalars, not a global window.
    a, b = sums.alias("a"), sums.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.coalesce(F.sum(f"b.{_PSUM}"), F.lit(0).cast("long")).alias(_OFFSET))
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row number under ``order_by`` (which must be a
    total order — include a unique tiebreak — for a deterministic result),
    without a single-partition window."""
    return range_prefix_sum(
        df, order_by, F.lit(1).cast("long"), out_col, num_partitions=num_partitions
    )


def exact_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    k: int,
    out_col: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``ntile(k) OVER (ORDER BY ...)`` semantics — the first
    ``n mod k`` tiles get ``n div k + 1`` rows, the rest ``n div k`` —
    computed from the range-partitioned global rank instead of a
    single-partition window.  ``order_by`` must be a total order for the
    engine-deterministic assignment the oracles require."""
    rank_col = "__rp_rank"
    n_col = "__rp_n"
    ranked = global_row_number(df, order_by, rank_col, num_partitions=num_partitions)
    total = ranked.groupBy().agg(F.max(rank_col).alias(n_col))
    r = F.col(rank_col)
    n = F.col(n_col)
    q = F.floor(n / k).cast("long")  # rows in a short tile
    rem = (n % k).cast("long")  # number of long (q+1-row) tiles
    long_rows = rem * (q + 1)  # rows covered by the long tiles
    tile = (
        F.when(r <= long_rows, F.floor((r - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((r - long_rows - 1) / q) + 1)
        .cast("long")
    )
    return (
        ranked.join(F.broadcast(total))
        .withColumn(out_col, tile)
        .drop(rank_col, n_col)
    )
