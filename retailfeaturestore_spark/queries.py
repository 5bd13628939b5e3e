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
from .operators.encode import group_mode, onehot_encode, topk_categories
from .operators.normalize import lineitem_to_bronze
from .operators.pit import (
    asof_join,
    asof_snapshot,
    interval_existence_labels,
    latest_per_key,
)
from .operators.window_features import build_customer_features, user_activity_features

# Frozen category contract (the engine's feature_names.txt analogue — computed
# once offline, applied as static when() lists; SURVEY.md §4.2.4).
MKTSEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

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


# ---------------------------------------------------------------------------
# M3 — point-in-time + labels (A4, J2, J3; SURVEY.md §2.3/§2.5)
# ---------------------------------------------------------------------------

_LATEST_EVENT_ORACLE = """
SELECT event_id, user_id, ts, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


@register("latest_event_per_user", oracle=_LATEST_EVENT_ORACLE, tags=("pit",))
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 latest-per-group with an explicit deterministic tiebreak
    (jobs/materialize_online.py:19 relies on stable-sort accident)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    return latest_per_key(ev, "user_id", "ts", "event_id")


_ASOF_CUTOFF = "2024-01-15 00:00:00"

_ASOF_SNAPSHOT_ORACLE = f"""
SELECT event_id, user_id, ts, event_type, value
FROM events
WHERE ts <= TIMESTAMP '{_ASOF_CUTOFF}'
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


@register("asof_snapshot_lookup", oracle=_ASOF_SNAPSHOT_ORACLE, tags=("pit",))
def q_asof_snapshot_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 point-in-time lookup: latest state per entity as of a cutoff
    (serving/feature_service.py:36-46 time travel, batch form).  The ts
    filter pushes down to the parquet scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    return asof_snapshot(ev, "user_id", "ts", _ASOF_CUTOFF, "event_id")


_ASOF_JOIN_ORACLE = """
SELECT
  a.event_id, a.user_id, a.ts,
  (SELECT b.value FROM events b
    WHERE b.user_id = a.user_id AND b.event_type = 'purchase' AND b.ts <= a.ts
    ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS asof_value,
  (SELECT b.ts FROM events b
    WHERE b.user_id = a.user_id AND b.event_type = 'purchase' AND b.ts <= a.ts
    ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS asof_ts
FROM events a
WHERE a.event_type = 'click'
"""


@register("asof_join_clicks_purchases", oracle=_ASOF_JOIN_ORACLE, tags=("pit", "join"))
def q_asof_join_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch as-of join via the union trick (ONE shuffle on user_id, no range
    join): for every click, the latest purchase at-or-before it.  This is the
    distributed generalization of the reference's per-entity as-of lookup."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        spine_ts="ts",
        lookup_ts="ts",
        value_cols=["value", "ts"],
        lookup_tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("asof_value").alias("asof_value"),
        F.col("asof_ts").alias("asof_ts"),
    )


_CHURN_ORDERS_ORACLE = """
WITH spine AS (
  SELECT DISTINCT o_custkey AS customer_id, o_orderdate AS t_ref FROM orders
)
SELECT
  s.customer_id, s.t_ref,
  CASE WHEN EXISTS (
    SELECT 1 FROM orders b
    WHERE b.o_custkey = s.customer_id
      AND b.o_orderdate >  s.t_ref
      AND b.o_orderdate <= s.t_ref + INTERVAL 30 DAY
  ) THEN 0 ELSE 1 END AS churn_30d
FROM spine s
"""


@register("churn_labels_orders", oracle=_CHURN_ORDERS_ORACLE, tags=("labels", "join"))
def q_churn_labels_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 interval existence join, self-table form: churn_30d = 1 iff no
    follow-up order in (t_ref, t_ref+30d].  Window formulation — zero joins,
    one shuffle (jobs/make_training_and_train.py:26-46 parity; boundary
    semantics: strictly-after start, inclusive end)."""
    orders = load_table(spark, sf_dir, "orders")
    return interval_existence_labels(
        orders.withColumnRenamed("o_custkey", "customer_id"),
        orders.withColumnRenamed("o_custkey", "customer_id"),
        key="customer_id",
        spine_ts="o_orderdate",
        event_ts="o_orderdate",
        horizon_days=30,
        label_col="churn_30d",
    )


_PURCHASE_AFTER_SIGNUP_ORACLE = """
WITH spine AS (
  SELECT DISTINCT user_id, ts AS t_ref FROM events WHERE event_type = 'signup'
)
SELECT
  s.user_id, s.t_ref,
  CASE WHEN EXISTS (
    SELECT 1 FROM events b
    WHERE b.user_id = s.user_id AND b.event_type = 'purchase'
      AND b.ts >  s.t_ref
      AND b.ts <= s.t_ref + INTERVAL 7 DAY
  ) THEN 0 ELSE 1 END AS no_purchase_7d
FROM spine s
"""


@register(
    "purchase_labels_after_signup",
    oracle=_PURCHASE_AFTER_SIGNUP_ORACLE,
    tags=("labels", "join"),
)
def q_purchase_labels_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 two-table form at microsecond precision: for each signup, did the
    user purchase within 7 days (strictly after, inclusive horizon)?"""
    ev = load_table(spark, sf_dir, "events")
    return interval_existence_labels(
        ev.where(F.col("event_type") == "signup"),
        ev.where(F.col("event_type") == "purchase"),
        key="user_id",
        spine_ts="ts",
        event_ts="ts",
        horizon_days=7,
        label_col="no_purchase_7d",
    )


# ---------------------------------------------------------------------------
# M3 — encoding + frequency (J4, A1, A2, A5)
# ---------------------------------------------------------------------------

_ONEHOT_ORACLE = """
SELECT
  c_custkey,
  CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS c_mktsegment__automobile,
  CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END AS c_mktsegment__building,
  CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END AS c_mktsegment__furniture,
  CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END AS c_mktsegment__household,
  CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END AS c_mktsegment__machinery
FROM customer
"""


@register("customer_onehot", oracle=_ONEHOT_ORACLE, tags=("encode",))
def q_customer_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 static one-hot against the frozen segment contract (the engine's
    feature_names.txt analogue, jobs/make_training_and_train.py:48-53)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return onehot_encode(cust, "c_mktsegment", list(MKTSEGMENTS)).drop("c_mktsegment")


_TOPK_SEGMENTS_ORACLE = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY n DESC, c_mktsegment ASC
LIMIT 3
"""


@register("topk_segments", oracle=_TOPK_SEGMENTS_ORACLE, tags=("agg", "topk"))
def q_topk_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+O2 value frequency top-k, deterministic tiebreak; Catalyst plans
    partial+final agg then TakeOrderedAndProject (no global sort)."""
    cust = load_table(spark, sf_dir, "customer")
    return topk_categories(cust, "c_mktsegment", 3)


_MODE_ORACLE = """
SELECT o_custkey, o_orderpriority AS o_orderpriority_mode, CAST(__n AS BIGINT) AS mode_count
FROM (
  SELECT o_custkey, o_orderpriority, count(*) AS __n
  FROM orders GROUP BY o_custkey, o_orderpriority
)
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY __n DESC, o_orderpriority ASC) = 1
"""


@register("priority_mode_per_customer", oracle=_MODE_ORACLE, tags=("agg",))
def q_priority_mode_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 per-group mode, ties -> lexicographically smallest (the reference's
    pandas mode().iloc[0] semantics made explicit, jobs/build_feature_views.py:59)."""
    orders = load_table(spark, sf_dir, "orders")
    return group_mode(orders, "o_custkey", "o_orderpriority")


_DISTINCT_PARTS_ORACLE = """
SELECT o.o_custkey AS customer_id,
       CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_custkey
"""


@register("distinct_parts_per_customer", oracle=_DISTINCT_PARTS_ORACLE, tags=("agg", "join"))
def q_distinct_parts_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 exact distinct count per group over a fact-fact equi-join.  Spark
    expands count(distinct) into a two-phase exact aggregation; at whale-key
    scale swap in approx_count_distinct (documented opt-in)."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    joined = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_custkey"),
        t["lineitem"].l_orderkey == F.col("o_orderkey"),
    )
    return joined.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# M5 — TPC-H-shaped join/agg coverage (SURVEY.md §7.1-M5): the entity-
# enrichment joins a feature store runs at scale.  Broadcast for dims,
# sort-merge for fact-fact, partial+final aggregation, top-k without global
# sort, exact decimal accumulation for engine-reproducible money sums.
# ---------------------------------------------------------------------------

_PRICING_SUMMARY_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,4))) AS DOUBLE)
                                                              AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                AS DECIMAL(25,6))) AS DOUBLE)                 AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      / CAST(count(*) AS DOUBLE)                              AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      / CAST(count(*) AS DOUBLE)                              AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
      / CAST(count(*) AS DOUBLE)                              AS avg_disc,
  CAST(count(*) AS BIGINT)                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_PRICING_SUMMARY_ORACLE, tags=("agg", "tpch"))
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with partial+final agg (map-side
    combine) — the canonical 'does aggregation scale' query.  Averages are
    exact-decimal sums divided by counts (deterministic), not F.avg over
    doubles (order-dependent)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    qty_sum = F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
    price_sum = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
    disc_sum = F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty_sum.alias("sum_qty"),
            price_sum.alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(25,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(25,6)")).cast("double").alias("sum_charge"),
            (qty_sum / n.cast("double")).alias("avg_qty"),
            (price_sum / n.cast("double")).alias("avg_price"),
            (disc_sum / n.cast("double")).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


_REVENUE_BY_NATION_ORACLE = """
SELECT
  n.n_name,
  r.r_name,
  CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,4))) AS DOUBLE)
    AS revenue,
  CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name, r.r_name
"""


@register("revenue_by_nation", oracle=_REVENUE_BY_NATION_ORACLE, tags=("join", "tpch"))
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join — fact-fact sort-merge (lineitem ⋈ orders)
    with explicitly broadcast dimensions (nation/region/customer-as-dim).
    The o_orderdate range predicate pushes down to the orders scan before
    the join."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation", "region"))
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    c = F.broadcast(t["customer"].select("c_custkey", "c_nationkey"))
    n = F.broadcast(t["nation"])
    r = F.broadcast(t["region"])
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    return joined.groupBy("n_name", "r_name").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.countDistinct("c_custkey").cast("long").alias("n_customers"),
    )


_TOP_CUSTOMERS_ORACLE = """
SELECT
  c.c_custkey,
  c.c_name,
  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
  CAST(count(*) AS BIGINT) AS n_orders
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
"""


@register("top_customers_by_revenue", oracle=_TOP_CUSTOMERS_ORACLE, tags=("join", "topk"))
def q_top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 top-k over a join+agg: TakeOrderedAndProject (per-partition heaps,
    no global sort), deterministic tiebreak on the key."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    agg = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    c = F.broadcast(t["customer"].select("c_custkey", "c_name"))
    return (
        agg.join(c, agg.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


_SHIPPING_PRIORITY_ORACLE = """
SELECT
  o.o_orderkey,
  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
  o.o_orderpriority,
  CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,4))) AS DOUBLE)
    AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


@register("shipping_priority", oracle=_SHIPPING_PRIORITY_ORACLE, tags=("join", "tpch", "topk"))
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter (broadcast semi-reduction) + two
    date predicates pushed to both fact scans + top-k."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = F.broadcast(
        t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    o = t["orders"].where(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_UNION_SLICES_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, 'urgent' AS slice
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice, 'high_value' AS slice
FROM orders WHERE o_totalprice > 400000.0
"""


@register("union_slices", oracle=_UNION_SLICES_ORACLE, tags=("setop",))
def q_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 UNION ALL of tagged slices (the reference's sheet/partition concat,
    jobs/ingest_xlsx_to_parquet.py:11) — overlapping rows preserved, no
    dedup shuffle."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_custkey", "o_totalprice", F.lit("urgent").alias("slice")
    )
    high = o.where(F.col("o_totalprice") > 400000.0).select(
        "o_orderkey", "o_custkey", "o_totalprice", F.lit("high_value").alias("slice")
    )
    return urgent.unionByName(high)
