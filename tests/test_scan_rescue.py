"""Row-group-gated scan parallelism rescue (io.load_table_parallel, r12).

Spark assigns parquet scan tasks per row group; the sf* testdata ships one
row group per file, so scan-fused pipelines serialize through one task.
The rescue inserts a single hash repartition when the layout is row-group
starved — and must NEVER fire on layouts it cannot inspect (an object-store
path where a spurious gate hit would bolt a full-table shuffle onto a
100 TB scan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from retailfeaturestore_spark.io import (
    _RG_COUNT_CACHE,
    _row_group_count,
    load_table,
    load_table_parallel,
)

SF = "/root/testdata/sf0.001"


def test_gate_fires_on_single_row_group_layout(spark):
    df = load_table_parallel(spark, SF, "lineitem", keys=("l_orderkey",))
    # the rescue is one hash repartition: RepartitionByExpression in plan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan or "Repartition" in plan


def test_gate_is_value_neutral(spark):
    a = load_table(spark, SF, "lineitem").agg(
        F.sum("l_quantity").cast("long").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    b = load_table_parallel(spark, SF, "lineitem", keys=("l_orderkey",)).agg(
        F.sum("l_quantity").cast("long").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (a.s, a.n) == (b.s, b.n)


@pytest.mark.parametrize(
    "path",
    ["s3://bucket/prod/table.parquet", "/nonexistent/path/table.parquet"],
)
def test_gate_fails_safe_on_uninspectable_layouts(path):
    """Non-local or missing paths must report 'many row groups' so the
    rescue NEVER fires where the footer read cannot see the layout."""
    _RG_COUNT_CACHE.pop(path, None)
    assert _row_group_count(path) >= 1 << 20


def test_unreadable_footer_counts_as_many(tmp_path):
    bad = tmp_path / "corrupt.parquet"
    bad.write_bytes(b"not a parquet file")
    assert _row_group_count(str(bad)) >= 1 << 20


def test_local_count_is_exact_and_memoized():
    p = f"{SF}/lineitem.parquet"
    _RG_COUNT_CACHE.pop(p, None)
    n1 = _row_group_count(p)
    assert 1 <= n1 < 1 << 20
    assert _RG_COUNT_CACHE[p] == n1
