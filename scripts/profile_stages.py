#!/usr/bin/env python
"""Per-stage profile of named queries: runs each query warm then
measured with the event log on, and prints per-stage task wall / CPU /
python-worker time so optimization targets the right operator
(guide §1: measure first; §7.1: find the slow stage).

Usage: python scripts/profile_stages.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = sys.argv[1:]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVLOG = "/tmp/profile_stages_evlog"


def main() -> None:
    shutil.rmtree(EVLOG, ignore_errors=True)
    os.makedirs(EVLOG)

    from pyspark.sql import SparkSession

    from __spark_entry__ import queries

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-stages")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{EVLOG}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def run(name: str) -> None:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    windows: dict[str, tuple[float, float, float]] = {}
    for name in QUERIES:
        run(name)  # warm
        t0 = time.time() * 1000
        w0 = time.perf_counter()
        run(name)
        wall = time.perf_counter() - w0
        windows[name] = (t0, time.time() * 1000, wall)
    spark.stop()
    time.sleep(2)

    # stage_id -> {first_launch, last_finish, wall, cpu, py, n, input, shuffle_r, shuffle_w}
    stages: dict[int, dict] = {}
    jobs: list[tuple[float, float, str]] = []  # (submit_ms, stage_ids, desc)
    for root, _dirs, files in os.walk(EVLOG):
        for fn in files:
            path = os.path.join(root, fn)
            if path.endswith((".zstd", ".lz4", ".snappy")) or "appstatus" in path:
                continue
            with open(path) as f:
                for line in f:
                    if '"SparkListenerTaskEnd"' in line:
                        try:
                            ev = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        sid = ev.get("Stage ID")
                        info = ev.get("Task Info") or {}
                        tm = ev.get("Task Metrics") or {}
                        st = stages.setdefault(
                            sid,
                            {
                                "launch": float("inf"),
                                "finish": 0.0,
                                "wall": 0.0,
                                "cpu": 0.0,
                                "n": 0,
                                "in_mb": 0.0,
                                "sr_mb": 0.0,
                                "sw_mb": 0.0,
                            },
                        )
                        lt = info.get("Launch Time", 0)
                        ft = info.get("Finish Time", 0)
                        st["launch"] = min(st["launch"], lt)
                        st["finish"] = max(st["finish"], ft)
                        st["wall"] += (ft - lt) / 1e3
                        st["cpu"] += (tm.get("Executor CPU Time", 0)) / 1e9
                        st["n"] += 1
                        st["in_mb"] += (tm.get("Input Metrics") or {}).get(
                            "Bytes Read", 0
                        ) / 1e6
                        st["sr_mb"] += (
                            (tm.get("Shuffle Read Metrics") or {}).get(
                                "Remote Bytes Read", 0
                            )
                            + (tm.get("Shuffle Read Metrics") or {}).get(
                                "Local Bytes Read", 0
                            )
                        ) / 1e6
                        st["sw_mb"] += (
                            (tm.get("Shuffle Write Metrics") or {}).get(
                                "Shuffle Bytes Written", 0
                            )
                        ) / 1e6

    for name, (t0, t1, wall) in windows.items():
        mine = {
            sid: st
            for sid, st in stages.items()
            if t0 <= st["launch"] <= t1
        }
        tot_wall = sum(s["wall"] for s in mine.values())
        tot_cpu = sum(s["cpu"] for s in mine.values())
        print(
            f"\n=== {name}: wall {wall:.2f}s, {len(mine)} stages, "
            f"task wall {tot_wall:.2f}s, task cpu {tot_cpu:.2f}s, "
            f"cpu/wall {tot_cpu / tot_wall if tot_wall else 0:.2f}"
        )
        for sid in sorted(mine):
            s = mine[sid]
            span = (s["finish"] - s["launch"]) / 1e3
            print(
                f"  stage {sid:>5}: span {span:6.2f}s  n={s['n']:>3} "
                f"task_wall {s['wall']:7.2f}s cpu {s['cpu']:7.2f}s  "
                f"in {s['in_mb']:7.2f}MB  sr {s['sr_mb']:6.2f}MB "
                f"sw {s['sw_mb']:6.2f}MB"
            )


if __name__ == "__main__":
    main()
