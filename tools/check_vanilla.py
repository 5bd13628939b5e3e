"""Vanilla-session regression harness.

The correctness driver runs every registry query under its OWN SparkSession,
built with zero engine configs.  Round 1 failed 17/50 driver queries because
the engine implicitly depended on session.get_spark()'s confs
(nanosAsLong / inferTimestampNTZ / UTC).  This script reproduces the driver's
environment exactly: a bare ``SparkSession.builder.master(local[N])`` with NO
engine configs, then executes every registered query and reports any
exception.  Run it in a FRESH process (the engine session must not already
exist in the JVM, or getOrCreate would inherit its confs and hide the bug).

Usage:  python tools/check_vanilla.py [sf_dir] [name_filter ...]
Exit 0 = every query executed; nonzero = failures (one line each).
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Deliberately config-free (mirrors the driver); local[2] keeps JVM small.
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("vanilla-check")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from retailfeaturestore_spark.queries import REGISTRY

    failures: list[str] = []
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            df = qd.fn(spark, sf_dir)
            df.limit(5).collect()
            print(f"ok   {name}", flush=True)
        except Exception:
            failures.append(name)
            tb = traceback.format_exc().strip().splitlines()
            print(f"FAIL {name}: {tb[-1]}", flush=True)

    print(f"\n{len(failures)} failures of {len([n for n in REGISTRY if not only or n in only])}")
    for name in failures:
        print(f"  FAIL {name}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
