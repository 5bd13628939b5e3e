"""Local differential checker — mimics the driver's t2 correctness gate.

Runs each registered query through Spark AND its DuckDB oracle on the same
parquet, then compares row count, column names, and an order-insensitive
value hash.  Usage::

    python tools/check_oracle.py [query ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from retailfeaturestore_spark.queries import REGISTRY  # noqa: E402
from retailfeaturestore_spark.schemas import TESTDATA_TABLES  # noqa: E402
from retailfeaturestore_spark.session import get_spark  # noqa: E402


def canonical(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
            return "∅"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    names = args.names or [n for n, qd in REGISTRY.items() if qd.oracle]
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        qd = REGISTRY[name]
        t0 = time.time()
        sdf = qd.fn(spark, args.sf).toPandas()
        t_spark = time.time() - t0
        if qd.oracle is None:
            print(f"{name}: rows-only, {len(sdf)} rows ({t_spark:.1f}s)")
            continue
        t0 = time.time()
        ddf = con.execute(qd.oracle).df()
        t_duck = time.time() - t0
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_hash = ok_rows and ok_cols and canonical(sdf) == canonical(ddf)
        # Sketch-backed queries ("approx" tag: HLL++/t-digest estimates) have
        # legitimately engine-specific values — their oracle certifies rows +
        # schema only, and the value hash is reported but never gates (the
        # error bounds are pytest-asserted instead).
        sketch = "approx" in qd.tags
        passed = ok_rows and ok_cols and (ok_hash or sketch)
        status = "OK" if passed else "FAIL"
        note = " (sketch: rows+schema only)" if sketch else ""
        print(
            f"{name}: {status} rows={len(sdf)}/{len(ddf)} cols={ok_cols} "
            f"hash={ok_hash}{note} (spark {t_spark:.1f}s, duck {t_duck:.1f}s)"
        )
        if not passed:
            failures += 1
            if ok_rows and ok_cols:
                # locate first differing column for debugging
                sc = sdf.reindex(sorted(sdf.columns), axis=1)
                dc = ddf.reindex(sorted(ddf.columns), axis=1)
                for c in sc.columns:
                    h1 = canonical(sc[[c]])
                    h2 = canonical(dc[[c]])
                    if h1 != h2:
                        print(f"  first differing column: {c}")
                        print("  spark:", sorted(sc[c].head(1000).tolist())[:5])
                        print("  duck :", sorted(dc[c].head(1000).tolist())[:5])
                        break
            else:
                print(f"  spark cols: {sorted(sdf.columns)}")
                print(f"  duck  cols: {sorted(ddf.columns)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
