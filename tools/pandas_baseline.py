"""Single-node pandas baseline for the feature-view build.

An INDEPENDENT reimplementation of the reference pipeline's execution model
(single-process pandas, per-customer groupby loop, event-time rolling windows
closed on both ends — the behavior documented in SURVEY.md §3.1), applied to
the same testdata mapping the Spark flagship uses (lineitem ⋈ orders ->
bronze order lines).  This measures "reference-style single-node throughput"
on identical input so BASELINE.md can compare all three engines
(pandas loop / DuckDB / this engine) at the same scale factor.

Usage: python tools/pandas_baseline.py [sf_dir]
Prints one JSON line: {"engine": "pandas-loop", "sf": ..., "rows": N,
"seconds": S}.
"""

from __future__ import annotations

import json
import sys
import time

import pandas as pd

WINDOWS = {"1d": "1D", "7d": "7D", "30d": "30D"}


def build_bronze(sf_dir: str) -> pd.DataFrame:
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber", "l_returnflag",
                 "l_extendedprice", "l_discount"],
    )
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    df = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey", how="inner")
    df["is_cancel"] = df["l_returnflag"] == "R"
    df["line_amount"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
    df = df.rename(
        columns={"o_custkey": "customer_id", "o_orderdate": "invoice_date",
                 "l_partkey": "stock_code"}
    )
    return df[["customer_id", "invoice_date", "stock_code", "is_cancel", "line_amount"]]


def feature_build_loop(bronze: pd.DataFrame) -> pd.DataFrame:
    """Per-entity loop with event-time rolling frames — the reference's
    execution shape (eager pandas, Python group iteration)."""
    bronze = bronze.sort_values(["customer_id", "invoice_date"], kind="stable")
    bronze["txn"] = (~bronze["is_cancel"]).astype("int32")
    bronze["cancel"] = bronze["is_cancel"].astype("int32")
    bronze["spend"] = bronze["line_amount"].where(~bronze["is_cancel"], 0.0)

    outs = []
    for cid, g in bronze.groupby("customer_id", sort=False):
        g = g.set_index("invoice_date")
        f = pd.DataFrame(index=g.index)
        for name, w in WINDOWS.items():
            roll = g.rolling(w, closed="both")
            txn = roll["txn"].sum()
            spend = roll["spend"].sum()
            cancel = roll["cancel"].sum()
            uniq = roll["stock_code"].apply(lambda s: s.nunique(), raw=False)
            f[f"txn_count_{name}"] = txn
            f[f"spend_{name}"] = spend
            f[f"unique_skus_{name}"] = uniq
            f[f"avg_basket_value_{name}"] = spend / txn.where(txn > 0, other=1)
            denom = (cancel + txn).where((cancel + txn) > 0, other=1)
            f[f"cancel_rate_{name}"] = (cancel / denom).clip(0, 1)
        f["tenure_days"] = (g.index - g.index.min()).days
        f["customer_id"] = cid
        outs.append(f.reset_index().rename(columns={"invoice_date": "t_ref"}))
    return pd.concat(outs, ignore_index=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bronze = build_bronze(sf_dir)
    t0 = time.time()
    out = feature_build_loop(bronze)
    dt = time.time() - t0
    print(json.dumps({
        "engine": "pandas-loop",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "rows": int(len(out)),
        "seconds": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
