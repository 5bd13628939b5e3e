"""Stage-level profile of one registry query from the Spark event log.

Runs a query COLD (same eviction protocol as bench.py), with the event log
enabled, then decomposes wall time per stage: submit->complete wall, task
count, summed executor run time, summed JVM GC time, scheduler delay,
shuffle bytes read/written.  This is the guide §7 empirical loop for a
local[<N>] session where the UI is disabled.

Usage: python tools/profile_query.py <query> [--runs N] [--sf DIR]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from retailfeaturestore_spark.queries import REGISTRY  # noqa: E402
from retailfeaturestore_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 1
    skip: set[int] = set()
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        skip |= {i, i + 1}
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        skip |= {i, i + 1}
    names = [a for i, a in enumerate(argv) if i not in skip and not a.startswith("--")]
    evdir = tempfile.mkdtemp(prefix="rfs-ev-")
    spark = get_spark(
        "rfs-profile",
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEMORY", "6g"
            ),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup identical to bench.py
    REGISTRY["normalize_lineitem"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        qd = REGISTRY[name]
        for r in range(runs):
            bench._evict_all(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name}#run{r}")
            t0 = time.monotonic()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"== {name} run {r}: {time.monotonic() - t0:.3f}s wall")
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    time.sleep(1.0)
    (log,) = glob.glob(os.path.join(evdir, "*"))
    if os.path.isdir(log):  # Spark 4 rolling event-log layout
        files = sorted(glob.glob(os.path.join(log, "events*")))
    else:
        files = [log]
    stages: dict[tuple[int, int], dict] = {}
    jobs: dict[int, dict] = {}
    def _open(p):
        if p.endswith(".zstd"):
            import io

            try:
                import zstandard
            except ImportError:
                import subprocess

                out = subprocess.run(["zstd", "-dc", p], capture_output=True)
                return io.StringIO(out.stdout.decode())
            return io.TextIOWrapper(
                zstandard.ZstdDecompressor().stream_reader(open(p, "rb"))
            )
        return open(p)

    lines = (ln for p in files for ln in _open(p))
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                st = stages.setdefault(key, {"run": 0, "gc": 0, "n": 0,
                                             "sr": 0, "sw": 0, "in": 0})
                st["name"] = si["Stage Name"].split("\n")[0]
                st["wall"] = si.get("Completion Time", 0) - si.get(
                    "Submission Time", si.get("Completion Time", 0)
                )
            elif e == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                st = stages.setdefault(key, {"run": 0, "gc": 0, "n": 0,
                                             "sr": 0, "sw": 0, "in": 0})
                tm = ev.get("Task Metrics") or {}
                st["n"] += 1
                st["run"] += tm.get("Executor Run Time", 0)
                st["gc"] += tm.get("JVM GC Time", 0)
                st["sr"] += (tm.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) + (tm.get("Shuffle Read Metrics") or {}).get(
                    "Local Bytes Read", 0
                )
                st["sw"] += (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                st["in"] += (tm.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                )
    for jid in sorted(jobs):
        j = jobs[jid]
        wall = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        ran = [k for k in stages if k[0] in set(j["stages"])]
        print(f"\nJOB {jid} [{j['desc']}] wall={wall:.3f}s "
              f"stages_ran={len(ran)}/{len(j['stages'])}")
        for k in sorted(ran):
            s = stages[k]
            print(
                f"  stage {k[0]:>4} n={s['n']:>3} wall={s.get('wall', 0)/1000:6.3f}s "
                f"run={s['run']/1000:7.3f}s gc={s['gc']/1000:6.3f}s "
                f"sr={s['sr']>>10:>8}K sw={s['sw']>>10:>8}K in={s['in']>>10:>8}K "
                f"{s.get('name', '')[:60]}"
            )
    n_stages = len(stages)
    total_wall = sum(s.get("wall", 0) for s in stages.values()) / 1000
    total_run = sum(s["run"] for s in stages.values()) / 1000
    total_gc = sum(s["gc"] for s in stages.values()) / 1000
    print(f"\nTOTAL stages={n_stages} stage_wall_sum={total_wall:.3f}s "
          f"task_run_sum={total_run:.3f}s gc_sum={total_gc:.3f}s")
    print(f"event log: {log}")


if __name__ == "__main__":
    main()
