"""Ingest-normalization parity tests (jobs/ingest_xlsx_to_parquet.py:24-42):
coercing casts, string normalize, cancel flag, not-null quarantine."""

from __future__ import annotations

from pyspark.sql import Row

from retailfeaturestore_spark.operators.normalize import normalize_orders_raw


def raw_row(**kw):
    base = dict(
        Invoice="536365",
        StockCode=" 85123a ",
        Description=" WHITE LANTERN ",
        Quantity="6",
        InvoiceDate="2010-12-01 08:26:00",
        Price="2.55",
        Country=" United Kingdom ",
    )
    base["Customer ID"] = kw.pop("customer_id", "17850")
    base.update(kw)
    return Row(**base)


def test_normalize_happy_path(spark):
    out = normalize_orders_raw(spark.createDataFrame([raw_row()])).collect()[0]
    assert out.invoice == "536365"
    assert out.stock_code == "85123A"  # upper + trim (P3)
    assert out.description == "WHITE LANTERN"
    assert out.quantity == 6 and abs(out.unit_price - 2.55) < 1e-12
    assert out.customer_id == 17850
    assert out.country == "United Kingdom"
    assert out.is_cancel is False
    assert abs(out.line_amount - 15.30) < 1e-9  # P5, double math


def test_cancel_prefix_flag(spark):
    out = normalize_orders_raw(
        spark.createDataFrame([raw_row(Invoice="C536379")])
    ).collect()[0]
    assert out.is_cancel is True


def test_garbage_coerces_to_null_and_null_keys_quarantined(spark):
    rows = [
        raw_row(Quantity="garbage"),          # quantity -> null -> dropped (P6)
        raw_row(customer_id=None),            # null key -> dropped
        raw_row(InvoiceDate="not a date"),    # ts -> null -> dropped
        raw_row(Price="oops"),                # price null is ALLOWED (non-key)
    ]
    out = normalize_orders_raw(spark.createDataFrame(rows))
    kept = out.collect()
    assert len(kept) == 1
    assert kept[0].unit_price is None and kept[0].line_amount is None
