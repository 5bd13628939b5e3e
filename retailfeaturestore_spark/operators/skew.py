"""Skew-mitigation primitives for whale keys (SURVEY.md §7.4.8).

UK retail data has whale customers; at 100 TB a single hot key can hold a
straggler task hostage.  AQE's skew-join splitting covers joins; these
helpers cover the aggregation side:

- ``salted_agg``: two-phase aggregation — salt the key into ``n_salts``
  subkeys, partially aggregate per (key, salt), then finish per key.  The
  hot key's work spreads over ``n_salts`` tasks; the second shuffle moves
  only ``n_salts`` rows per key.  Works for any algebraic aggregate
  (sum/count/min/max — pass both phases explicitly).
- ``broadcast_threshold_note``: joins against dims should broadcast; for a
  skewed fact-fact join, prefer AQE (enabled in session.py) over manual
  salting — manual join salting duplicates the small side n_salts times.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg"]


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    partial_aggs: dict[str, Column],
    final_aggs: Callable[[str], dict[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs``: name -> aggregate Column for phase 1 (per key+salt).
    ``final_aggs``: given the partial column name, the phase-2 re-aggregate
    (e.g. partial sum -> sum, partial count -> sum, partial min -> min).

    Example::

        salted_agg(
            lineitem, "l_orderkey",
            {"qty_sum": F.sum("l_quantity"), "n": F.count(F.lit(1))},
            lambda c: {"qty_sum": F.sum("qty_sum"), "n": F.sum("n")}[c],
        )
    """
    keys = [key] if isinstance(key, str) else list(key)
    # per-ROW salt (monotonic id varies within a key) — spreads a hot key's
    # rows across n_salts partial groups
    salted = df.withColumn("__salt", F.monotonically_increasing_id() % n_salts)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[final_aggs(name).alias(name) for name in partial_aggs]
    )
