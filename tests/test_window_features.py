"""Edge-case semantics of the window feature engine (SURVEY.md §5.2.3):
equal-timestamp ties, window-boundary inclusion (closed="both"), cancels-only
customers, guarded denominators, tenure floor semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from retailfeaturestore_spark.operators.window_features import build_customer_features

BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("invoice_date", T.TimestampType()),
        T.StructField("stock_code", T.StringType()),
        T.StructField("is_cancel", T.BooleanType()),
        T.StructField("line_amount", T.DoubleType()),
    ]
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def build(spark, rows, **kw):
    df = spark.createDataFrame(rows, BRONZE_SCHEMA)
    return build_customer_features(df, windows={"1d": 1}, **kw)


def snap(df, cols):
    return [
        tuple(r[c] for c in cols)
        for r in df.orderBy("invoice_date", "stock_code").collect()
    ]


def test_equal_timestamp_ties_share_window(spark):
    """SQL range-frame semantics: all rows at the same event time see the
    same window (deliberate divergence from pandas positional rolling —
    SURVEY.md §2.4 tie caveat)."""
    rows = [
        (1, ts("2024-01-01 10:00:00"), "A", False, 10.0),
        (1, ts("2024-01-01 10:00:00"), "B", False, 20.0),
    ]
    out = snap(build(spark, rows), ["txn_count_1d", "spend_1d", "unique_skus_1d"])
    assert out == [(2.0, 30.0, 2.0), (2.0, 30.0, 2.0)]


def test_window_boundary_both_closed(spark):
    """A row exactly `w` before the current row is INSIDE the frame
    (pandas rolling closed="both", jobs/build_feature_views.py:35)."""
    rows = [
        (1, ts("2024-01-01 10:00:00"), "A", False, 1.0),
        (1, ts("2024-01-02 10:00:00"), "B", False, 2.0),  # exactly 1d later
        (1, ts("2024-01-03 10:00:00.000001"), "C", False, 4.0),  # 1d+1us after B
    ]
    out = snap(build(spark, rows), ["txn_count_1d", "spend_1d"])
    assert out[1] == (2.0, 3.0)  # includes the boundary row
    assert out[2] == (1.0, 4.0)  # boundary+1us excluded


def test_cancels_only_customer_guarded_ratios(spark):
    """txn_count 0 -> avg_basket guarded to spend/1; cancel_rate = 1."""
    rows = [(1, ts("2024-01-01 00:00:00"), "A", True, 50.0)]
    out = snap(
        build(spark, rows),
        ["txn_count_1d", "spend_1d", "avg_basket_value_1d", "cancel_rate_1d"],
    )
    assert out == [(0.0, 0.0, 0.0, 1.0)]


def test_tenure_floors_whole_24h_periods(spark):
    """23h59m -> 0 days; 24h exactly -> 1 day (pandas .days floor, NOT
    calendar datediff — SURVEY.md §7.4.6)."""
    rows = [
        (1, ts("2024-01-01 12:00:00"), "A", False, 1.0),
        (1, ts("2024-01-02 11:59:00"), "B", False, 1.0),
        (1, ts("2024-01-02 12:00:00"), "C", False, 1.0),
    ]
    out = snap(build(spark, rows), ["tenure_days"])
    assert [r[0] for r in out] == [0, 0, 1]


def test_one_row_per_input_line_and_contract_cols(spark):
    rows = [
        (1, ts("2024-01-01 00:00:00"), "A", False, 5.0),
        (2, ts("2024-01-05 00:00:00"), "B", False, 7.0),
    ]
    df = build_customer_features(
        spark.createDataFrame(rows, BRONZE_SCHEMA)
    )
    assert df.count() == 2
    for base in ("txn_count", "spend", "unique_skus", "avg_basket_value", "cancel_rate"):
        for w in ("1d", "7d", "30d"):
            assert f"{base}_{w}" in df.columns
    assert "tenure_days" in df.columns and "t_ref" in df.columns
