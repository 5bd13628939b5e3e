"""Session registry for operator-persisted frames.

Operators that persist an expensive intermediate (minhash signatures, the
KMeans/PQ quantized corpus, containment rare postings, pagerank edge/degree
tables) register it here, keyed ``(operator, scope)`` where scope is the
dataset (sf_dir) the frame derives from.  ``queries.invalidate_caches``
evicts by scope; re-entry under the same key unpersists the stale frame
first, so repeat calls never strand blocks in executor storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["register_persisted"]


def register_persisted(df: DataFrame, key: tuple[str, str | None]) -> None:
    reg = getattr(df.sparkSession, "_rfs_persisted", None)
    if reg is None or isinstance(reg, list):
        reg = df.sparkSession._rfs_persisted = {}
    old = reg.pop(key, None)
    if old is not None:
        old.unpersist(blocking=False)
    reg[key] = df
