"""create_views: the pure-SQL entry path — every testdata table queryable
by name via spark.sql, with load_table's normalization applied."""

from __future__ import annotations

from pyspark.sql import functions as F

from retailfeaturestore_spark.io import create_views, load_table
from retailfeaturestore_spark.schemas import TESTDATA_TABLES

from conftest import requires_testdata

pytestmark = requires_testdata

SF = "/root/testdata/sf0.001"


def test_create_views_registers_all_tables_sql_runnable(spark):
    names = create_views(spark, SF)
    assert tuple(names) == TESTDATA_TABLES
    # a cross-table SQL join runs against the views
    row = spark.sql(
        "SELECT count(*) AS n FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey"
    ).collect()[0]
    assert row.n == load_table(spark, SF, "orders").count()
    # timestamp normalization applied: events.ts is a real timestamp type
    assert dict(spark.table("events").dtypes)["ts"].startswith("timestamp")
    # subset registration works
    assert create_views(spark, SF, names=("documents",)) == ["documents"]
    assert spark.sql("SELECT max(doc_id) FROM documents").collect()[0][0] is not None
