"""Named query registry: every operator from SURVEY.md §2 as a
(PySpark program, DuckDB oracle SQL) pair.

This is the engine's differential-correctness harness (SURVEY.md §5.2): the
driver runs each Spark query and its oracle side-by-side at sf=0.01 and
compares row count + schema + order-insensitive value hash.

Determinism contract (what makes value-hashes match bit-for-bit):
- every multi-row reduction over floating-point data accumulates in DECIMAL
  (exact, order-independent) or integers, casting to double only at the end;
- no transcendental functions in compared outputs (libm differs per engine);
- every tie (top-k, latest-per-group, mode) is broken by an explicit
  deterministic key;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table, load_tables
from .operators.normalize import lineitem_to_bronze
from .operators.window_features import build_customer_features, user_activity_features

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


# ---------------------------------------------------------------------------
# M1 — ingest/normalize composite (P1-P8, P16; SURVEY.md §2.2)
# ---------------------------------------------------------------------------

_NORMALIZE_LINEITEM_ORACLE = """
SELECT
  l_orderkey                               AS order_id,
  l_linenumber                             AS line_no,
  'P-' || CAST(l_partkey AS VARCHAR)       AS sku,
  CAST(l_quantity AS INTEGER)              AS qty,
  upper(trim(l_returnflag))                AS return_flag,
  (l_returnflag = 'R')                     AS is_return,
  strftime(l_shipdate, '%Y-%m-%d')         AS ship_date,
  l_extendedprice                          AS gross_amount,
  l_extendedprice * (1.0 - l_discount)     AS net_amount,
  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
  l_extendedprice / (CASE WHEN l_quantity > 0 THEN l_quantity ELSE 1 END)
                                           AS avg_unit_price,
  LEAST(GREATEST(l_discount, 0.0), 0.05)   AS capped_discount
FROM lineitem
WHERE l_orderkey IS NOT NULL AND l_quantity > 0
"""


@register("normalize_lineitem", oracle=_NORMALIZE_LINEITEM_ORACLE, tags=("projection", "filter"))
def q_normalize_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rename / P2 cast / P3 string-normalize / P4 prefix flag / P5
    arithmetic / P6 not-null filter / P11 guarded div / P12 clip / P16
    ts->date, composed exactly like the reference's ingest
    (``jobs/ingest_xlsx_to_parquet.py:24-42``) but over testdata lineitem.
    One declarative select => Catalyst pushes the filter and prunes columns
    at the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey").isNotNull() & (F.col("l_quantity") > 0)).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.concat(F.lit("P-"), F.col("l_partkey").cast("string")).alias("sku"),
        F.col("l_quantity").cast("int").alias("qty"),
        F.upper(F.trim(F.col("l_returnflag"))).alias("return_flag"),
        (F.col("l_returnflag") == "R").alias("is_return"),
        # P16 ts->date as a string — avoids DATE-type representation skew
        # across engines and matches the reference's partition-value shape
        # (jobs/ingest_xlsx_to_parquet.py:46).
        F.date_format(F.col("l_shipdate"), "yyyy-MM-dd").alias("ship_date"),
        F.col("l_extendedprice").alias("gross_amount"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("net_amount"),
        (
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("charge"),
        (
            F.col("l_extendedprice")
            / F.when(F.col("l_quantity") > 0, F.col("l_quantity")).otherwise(F.lit(1))
        ).alias("avg_unit_price"),
        F.least(F.greatest(F.col("l_discount"), F.lit(0.0)), F.lit(0.05)).alias(
            "capped_discount"
        ),
    )


# ---------------------------------------------------------------------------
# M2 — the window feature engine (W1-W6 + A5; SURVEY.md §2.4)
# ---------------------------------------------------------------------------

_FEATURE_WINDOW_SQL = """
WITH bronze AS (
  SELECT
    o.o_custkey                              AS customer_id,
    CAST(l.l_orderkey AS VARCHAR)            AS invoice,
    l.l_linenumber                           AS line_no,
    CAST(l.l_partkey AS VARCHAR)             AS stock_code,
    o.o_orderdate                            AS invoice_date,
    (l.l_returnflag = 'R')                   AS is_cancel,
    l.l_extendedprice * (1.0 - l.l_discount) AS line_amount
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_custkey IS NOT NULL AND o.o_orderdate IS NOT NULL
),
feat AS (
  SELECT
    customer_id, invoice, line_no, invoice_date AS t_ref,
    {windowed},
    CAST(floor((epoch_us(invoice_date)
         - min(epoch_us(invoice_date)) OVER (PARTITION BY customer_id))
         / 86400000000.0) AS BIGINT)          AS tenure_days
  FROM bronze
  WINDOW
    w_1d  AS (PARTITION BY customer_id ORDER BY invoice_date
              RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW),
    w_7d  AS (PARTITION BY customer_id ORDER BY invoice_date
              RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW),
    w_30d AS (PARTITION BY customer_id ORDER BY invoice_date
              RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
)
SELECT * FROM feat
"""


def _feature_window_block(w: str) -> str:
    txn = f"CAST(sum(CASE WHEN is_cancel THEN 0 ELSE 1 END) OVER w_{w} AS DOUBLE)"
    cancel = f"CAST(sum(CASE WHEN is_cancel THEN 1 ELSE 0 END) OVER w_{w} AS DOUBLE)"
    spend = (
        f"CAST(sum(CAST(CASE WHEN is_cancel THEN 0.0 ELSE line_amount END"
        f" AS DECIMAL(18,4))) OVER w_{w} AS DOUBLE)"
    )
    uniq = f"CAST(count(DISTINCT stock_code) OVER w_{w} AS DOUBLE)"
    return ",\n    ".join(
        [
            f"{txn} AS txn_count_{w}",
            f"{spend} AS spend_{w}",
            f"{uniq} AS unique_skus_{w}",
            f"{spend} / (CASE WHEN {txn} > 0 THEN {txn} ELSE 1.0 END) AS avg_basket_value_{w}",
            f"LEAST(GREATEST({cancel} / (CASE WHEN {cancel} + {txn} > 0 THEN {cancel} + {txn} ELSE 1.0 END), 0.0), 1.0) AS cancel_rate_{w}",
        ]
    )


_FEATURE_VIEW_ORACLE = _FEATURE_WINDOW_SQL.format(
    windowed=",\n    ".join(_feature_window_block(w) for w in ("1d", "7d", "30d"))
)

_FEATURE_COL_ORDER = (
    ["customer_id", "invoice", "line_no", "t_ref"]
    + [
        f"{base}_{w}"
        for w in ("1d", "7d", "30d")
        for base in ("txn_count", "spend", "unique_skus", "avg_basket_value", "cancel_rate")
    ]
    + ["tenure_days"]
)


@register("feature_view_build", oracle=_FEATURE_VIEW_ORACLE, tags=("window", "flagship"))
def q_feature_view_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core pipeline (``jobs/build_feature_views.py``) on the
    testdata mapping (FIXTURES.md §7): lineitem ⋈ orders -> bronze order lines
    -> W1-W6 event-time range-window features, one row per line.  Single
    shuffle on customer_id for the whole 15-column feature family."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    bronze = lineitem_to_bronze(t["lineitem"], t["orders"])
    feats = build_customer_features(bronze)
    return feats.select(*_FEATURE_COL_ORDER)


_USER_ACTIVITY_ORACLE = """
WITH feat AS (
  SELECT
    event_id, user_id, ts, event_type, value,
    CAST(count(*) OVER w_1d AS BIGINT)  AS event_count_1d,
    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w_1d AS DOUBLE) AS value_sum_1d,
    CAST(count(DISTINCT event_type) OVER w_1d AS BIGINT) AS unique_types_1d,
    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w_1d AS DOUBLE)
      / (CASE WHEN CAST(count(*) OVER w_1d AS DOUBLE) > 0
              THEN CAST(count(*) OVER w_1d AS DOUBLE) ELSE 1.0 END) AS avg_value_1d,
    LEAST(GREATEST(
      CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w_1d AS DOUBLE)
      / (CASE WHEN CAST(count(*) OVER w_1d AS DOUBLE) > 0
              THEN CAST(count(*) OVER w_1d AS DOUBLE) ELSE 1.0 END), 0.0), 1.0) AS error_rate_1d,
    CAST(count(*) OVER w_7d AS BIGINT)  AS event_count_7d,
    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w_7d AS DOUBLE) AS value_sum_7d,
    CAST(count(DISTINCT event_type) OVER w_7d AS BIGINT) AS unique_types_7d,
    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w_7d AS DOUBLE)
      / (CASE WHEN CAST(count(*) OVER w_7d AS DOUBLE) > 0
              THEN CAST(count(*) OVER w_7d AS DOUBLE) ELSE 1.0 END) AS avg_value_7d,
    LEAST(GREATEST(
      CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w_7d AS DOUBLE)
      / (CASE WHEN CAST(count(*) OVER w_7d AS DOUBLE) > 0
              THEN CAST(count(*) OVER w_7d AS DOUBLE) ELSE 1.0 END), 0.0), 1.0) AS error_rate_7d,
    CAST(floor((epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
         / 86400000000.0) AS BIGINT) AS tenure_days
  FROM events
  WINDOW
    w_1d AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW),
    w_7d AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
)
SELECT * FROM feat
"""


@register("user_activity_features", oracle=_USER_ACTIVITY_ORACLE, tags=("window",))
def q_user_activity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-W6 family over the events stream table: microsecond-exact range
    frames (sub-second event times), distinct-type counts, guarded ratios."""
    ev = load_table(spark, sf_dir, "events")
    out = user_activity_features(ev.select("event_id", "user_id", "ts", "event_type", "value"))
    cols = ["event_id", "user_id", "ts", "event_type", "value"]
    for w in ("1d", "7d"):
        cols += [
            f"event_count_{w}",
            f"value_sum_{w}",
            f"unique_types_{w}",
            f"avg_value_{w}",
            f"error_rate_{w}",
        ]
    cols.append("tenure_days")
    return out.select(*cols)
