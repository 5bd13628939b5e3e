"""Deterministic micro-testdata generator (CI / new-machine onboarding).

Produces the same 10-table star schema as the driver testdata
(TESTDATA.md: region nation customer supplier part orders lineitem events
documents embeddings), schema-compatible column-for-column, at a row scale
controlled by ``--sf``.  Values are seeded numpy draws — NOT the driver's
data (never write over /root/testdata); the point is that every query and
its DuckDB oracle run end-to-end on a machine that has no driver data,
e.g. the CI smoke gate.

Usage::

    python tools/gen_testdata.py --out ./testdata-ci/sf0.001 [--sf 0.001]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANG_WORDS = {
    "en": "the quick brown fox jumps over a lazy dog and runs far away home".split(),
    "fr": "le chat noir mange une pomme rouge dans la maison de mon ami".split(),
    "de": "der hund lauft schnell durch den wald und springt uber das haus".split(),
}

DAY_US = 86_400_000_000


def _ts(day_offsets: np.ndarray, base_day: int = 9_131) -> pa.Array:
    # base_day 9131 = 1995-01-01 in unix days; micros timestamps matching
    # the driver data's span (orders 1995..2001), so date-filtered queries
    # (pricing cutoffs, the 2000-01-01 train/test split) select real rows.
    return pa.array((base_day + day_offsets) * DAY_US, type=pa.timestamp("us"))


def generate(out: str, sf: float, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    n_cust = max(30, int(1500 * sf * 10))
    n_supp = max(10, int(100 * sf * 10))
    n_part = max(40, int(2000 * sf * 10))
    n_ord = max(150, int(15000 * sf * 10))
    n_line = max(600, int(60000 * sf * 10))
    n_ev = max(200, int(10000 * sf * 10))
    n_doc = max(60, int(500 * sf * 10))
    n_vec = max(60, int(500 * sf * 10))
    dims = 16

    os.makedirs(out, exist_ok=True)

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": pa.array(NATIONS),
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), type=pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n_cust + 1)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array([SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), type=pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(1, n_supp + 1)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
    }))
    w("part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), type=pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(1, n_part + 1)]),
        "p_brand": pa.array([f"Brand#{i % 5 + 1}{i % 5 + 1}" for i in range(n_part)]),
        "p_type": pa.array([f"TYPE {i % 12}" for i in range(n_part)]),
        "p_size": pa.array(rng.integers(1, 50, n_part), type=pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, n_part), 2)),
    }))

    order_day = rng.integers(0, 2_400, n_ord)  # 1995-01-01 .. ~2001-07
    w("orders", pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), type=pa.int64()),
        "o_orderstatus": pa.array([["O", "F", "P"][i] for i in rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 400000, n_ord), 2)),
        "o_orderdate": _ts(order_day),
        "o_orderpriority": pa.array([PRIORITIES[i] for i in rng.integers(0, 5, n_ord)]),
    }))

    l_order = rng.integers(1, n_ord + 1, n_line)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(l_order, type=pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_line), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_line), type=pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_line), type=pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_line).astype("float64")),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 100000, n_line), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_line), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_line), 2)),
        "l_returnflag": pa.array([["N", "R", "A"][i] for i in rng.integers(0, 3, n_line)]),
        "l_linestatus": pa.array([["O", "F"][i] for i in rng.integers(0, 2, n_line)]),
        "l_shipdate": _ts(order_day[l_order - 1] + rng.integers(1, 90, n_line)),
    }))

    # events span one month of 2024, like the driver table
    ev_day = rng.integers(0, 30, n_ev)
    ev_us = ev_day * DAY_US + rng.integers(0, DAY_US, n_ev)
    props = [
        '{"k": %d}' % k if i % 3 else None
        for i, k in enumerate(rng.integers(0, 100, n_ev))
    ]
    w("events", pa.table({
        "event_id": pa.array(range(1, n_ev + 1), type=pa.int64()),
        "ts": pa.array((19_723 * DAY_US) + ev_us, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, max(n_ev // 60, 20), n_ev), type=pa.int64()),
        "event_type": pa.array([EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.uniform(0, 100, n_ev), 4)),
        "props": pa.array(props),
    }))

    langs = [list(LANG_WORDS)[i] for i in rng.integers(0, 3, n_doc)]
    texts = []
    for i in range(n_doc):
        words = LANG_WORDS[langs[i]]
        body = " ".join(words[int(j)] for j in rng.integers(0, len(words), 40))
        if i % 10 == 9:  # near-duplicate pairs for the dedup queries
            texts.append(texts[i - 1] + " extra")
        else:
            texts.append(body)
    w("documents", pa.table({
        "doc_id": pa.array(range(1, n_doc + 1), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{i % 4}" for i in range(n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    vecs = np.round(rng.normal(0, 1, (n_vec, dims)), 4).astype("float32")
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), type=pa.int64()),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 5, n_vec), type=pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    generate(args.out, args.sf, args.seed)
    print(f"wrote 10 tables to {args.out}")


if __name__ == "__main__":
    main()
