"""Ad-hoc subset bench: same honest protocol as bench.py (noop-sink forced
evaluation, min-of-3, per-run eviction for checkpoint/resident plans,
same-run DuckDB anchor) for a named list of queries.

Usage: python tools/bench_subset.py q1 q2 ... [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from retailfeaturestore_spark.queries import REGISTRY  # noqa: E402
from retailfeaturestore_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark(
        "rfs-bench-subset",
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEMORY", "6g"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = bench._duck_connect(sf_dir)
    # warmup identical to bench.py
    REGISTRY["normalize_lineitem"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in names:
        qd = REGISTRY[name]
        evict = bench._should_evict(qd.tags) or bench._plan_holds_rdd_scan(
            qd.fn(spark, sf_dir)
        )
        best = None
        for _ in range(3):
            if evict:
                bench._evict_all(spark, sf_dir)
            t0 = time.monotonic()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        dsec = bench._time_duck(duck, qd.oracle) if qd.oracle else None
        out[name] = {
            "spark": round(best, 3),
            "duck": round(dsec, 3) if dsec else None,
            "ratio": round(best / dsec, 2) if dsec else None,
            "evict": evict,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
