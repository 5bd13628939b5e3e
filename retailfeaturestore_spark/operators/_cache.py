"""Session registry for operator-persisted frames.

Operators that persist an expensive intermediate (minhash signatures, the
KMeans/PQ quantized corpus, containment rare postings, pagerank edge/degree
tables) register it here, keyed ``(operator, scope)`` where scope is the
dataset (sf_dir) the frame derives from.  ``queries.invalidate_caches``
evicts by scope; re-entry under the same key unpersists the stale frame
first, so repeat calls never strand blocks in executor storage.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["register_persisted", "get_or_register", "session_memo"]


def _registry(spark: SparkSession) -> dict:
    reg = getattr(spark, "_rfs_persisted", None)
    if reg is None or isinstance(reg, list):
        reg = spark._rfs_persisted = {}
    return reg


def register_persisted(df: DataFrame, key: tuple[str, str | None]) -> None:
    reg = _registry(df.sparkSession)
    old = reg.pop(key, None)
    if old is not None:
        old.unpersist(blocking=False)
    reg[key] = df


def get_or_register(
    spark: SparkSession,
    key: tuple[str, str | None],
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Artifact-reuse path: return the frame already persisted under
    ``key``, or build + persist + register it.  Unlike
    ``register_persisted`` (which REPLACES, for operators that must rebuild
    on re-entry), this memoizes — the serving semantics of a resident
    pipeline where an index/posting artifact is built once per dataset and
    consumed by every request.  ``invalidate_caches`` (or any table
    rewrite that calls it) evicts by scope, forcing the next call to
    rebuild against fresh data."""
    reg = _registry(spark)
    cached = reg.get(key)
    if cached is not None:
        return cached
    df = build().persist()
    reg[key] = df
    return df


def session_memo(spark: SparkSession) -> dict:
    """Session memo for driver-side python artifacts (PQ codebooks,
    quantized query rows) that pair with a registered persisted frame.
    Keys are tuples whose [1] element is the dataset scope, same contract
    as the persisted-frame registry, so ``queries.invalidate_caches``
    evicts memo entries and frames together — a table rewrite can never
    leave stale codebooks serving a fresh corpus."""
    memo = getattr(spark, "_rfs_memo", None)
    if memo is None:
        memo = spark._rfs_memo = {}
    return memo
