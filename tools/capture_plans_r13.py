"""Capture .explain('formatted') output for named queries into plans/r13/.

Usage: python tools/capture_plans_r13.py SUFFIX q1 q2 ... [--sf DIR]
Writes plans/r13/<query>_<SUFFIX>.txt
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retailfeaturestore_spark.plans import formatted_plan  # noqa: E402
from retailfeaturestore_spark.queries import REGISTRY  # noqa: E402
from retailfeaturestore_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("rfs-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            tree = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            tree = f"ERROR building plan: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n\n{tree}\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
