"""Ingest-normalization operator set (SURVEY.md §2.2 P1-P8, P16).

The reference's ingest (``jobs/ingest_xlsx_to_parquet.py:24-42``) composes:
rename map (P1) -> coercing casts (P2) -> string normalize (P3) -> prefix flag
(P4) -> arithmetic derived column (P5) -> not-null key filter (P6) ->
timestamp->date (P16).  Here the same pipeline is one declarative ``select``
so Catalyst folds it into the scan: column pruning reaches the parquet reader
and the null-filter pushes down as a parquet row-group predicate.

Two faces:
- ``normalize_orders_raw``: the reference's exact xlsx-shape contract
  (FIXTURES.md §1) for retail-domain inputs.
- ``lineitem_to_bronze``: the driver-testdata mapping (FIXTURES.md §7) that
  reshapes TPC-H ``lineitem ⋈ orders [⋈ customer]`` into the bronze order-line
  contract (``o_custkey``->customer_id, ``l_partkey``->stock_code,
  ``l_returnflag='R'``->is_cancel, ``l_extendedprice*(1-l_discount)``->
  line_amount, ``c_mktsegment``->country analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import not_null_filter

__all__ = ["normalize_orders_raw", "lineitem_to_bronze"]


def normalize_orders_raw(raw: DataFrame) -> DataFrame:
    """xlsx-contract raw frame -> bronze orders (P1-P8 + P16 composed).

    Column-for-column parity with ``jobs/ingest_xlsx_to_parquet.py:14-42``;
    monetary math widened to double (SURVEY.md §7.4.5).  Spark's ``try_cast``
    reproduces pandas ``errors="coerce"`` (bad value -> null).
    """
    df = raw.select(
        F.trim(F.col("Invoice").cast("string")).alias("invoice"),
        F.upper(F.trim(F.col("StockCode").cast("string"))).alias("stock_code"),
        F.trim(F.coalesce(F.col("Description").cast("string"), F.lit(""))).alias(
            "description"
        ),
        F.col("Quantity").cast("string").try_cast("int").alias("quantity"),
        F.col("InvoiceDate").cast("string").try_cast("timestamp").alias("invoice_date"),
        F.col("Price").cast("string").try_cast("double").alias("unit_price"),
        F.col("`Customer ID`").cast("string").try_cast("int").alias("customer_id"),
        F.trim(F.col("Country").cast("string")).alias("country"),
    )
    df = df.withColumns(
        {
            # P4 — jobs/ingest_xlsx_to_parquet.py:36
            "is_cancel": F.coalesce(F.col("invoice").startswith("C"), F.lit(False)),
            # P5 — :37
            "line_amount": F.col("quantity").cast("double") * F.col("unit_price"),
        }
    )
    # P6 — :40-42
    return not_null_filter(df, "customer_id", "invoice_date", "quantity")


def lineitem_to_bronze(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame | None = None
) -> DataFrame:
    """TPC-H testdata -> bronze order-line contract (FIXTURES.md §7 mapping).

    ``orders`` (and optional ``customer``) are dimension-sized relative to
    ``lineitem`` only in the broadcast sense when filtered; at full scale the
    lineitem⋈orders join is an equi shuffle join on ``l_orderkey`` (AQE picks
    sort-merge; both sides could be bucketed by orderkey at rest to kill the
    shuffle entirely).  The optional customer join broadcasts.
    """
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    df = (
        lineitem.join(o, lineitem.l_orderkey == o.o_orderkey, "inner")
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("l_orderkey").cast("string").alias("invoice"),
            F.col("l_linenumber").alias("line_no"),
            F.col("l_partkey").cast("string").alias("stock_code"),
            F.col("l_quantity").cast("int").alias("quantity"),
            F.col("o_orderdate").alias("invoice_date"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
            (F.col("l_returnflag") == "R").alias("is_cancel"),
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
                "line_amount"
            ),
        )
    )
    if customer is not None:
        c = F.broadcast(customer.select("c_custkey", "c_mktsegment"))
        df = df.join(c, df.customer_id == c.c_custkey, "left").drop("c_custkey")
        df = df.withColumnRenamed("c_mktsegment", "country")
    return not_null_filter(df, "customer_id", "invoice_date")
