"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`retailfeaturestore_spark.queries` — the named query
registry where every SURVEY.md §2 operator lives as a (PySpark program,
DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust against being imported from any working directory
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from retailfeaturestore_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    feature-view build (W1-W6 window family) over lineitem ⋈ orders."""
    return REGISTRY["feature_view_build"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
