#!/usr/bin/env python
"""Event-log adjudication for bench drift (CLAUDE.md rule: before
chasing a "regression", compare task wall time vs Executor CPU Time —
cpu≈wall ⇒ real work; cpu≪wall ⇒ hypervisor contention noise).

Runs each named query once warm + once measured with the event log on,
then attributes TaskEnd records to the measured window by launch time
and prints wall seconds, summed task wall, summed executor CPU, and
the cpu/wall ratio.

Usage: python scripts/bench_adjudicate.py [query ...]
Defaults to the three worst r03-vs-r01 drift ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = sys.argv[1:] or ["events_sessionize", "join_inner_agg", "q18_large_orders"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVLOG = "/tmp/bench_adjudicate_evlog"


def main() -> None:
    os.makedirs(EVLOG, exist_ok=True)
    import shutil

    shutil.rmtree(EVLOG)
    os.makedirs(EVLOG)

    from pyspark.sql import SparkSession

    from __spark_entry__ import queries

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-adjudicate")
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
        run(name)  # warm: plan compile / worker spin-up outside the window
        t0 = time.time() * 1000
        w0 = time.perf_counter()
        run(name)
        wall = time.perf_counter() - w0
        windows[name] = (t0, time.time() * 1000, wall)
    spark.stop()
    time.sleep(2)

    tasks = []
    paths = []
    for root, _dirs, files in os.walk(EVLOG):
        paths.extend(os.path.join(root, fn) for fn in files)
    for path in paths:
        if path.endswith((".zstd", ".lz4", ".snappy")) or "appstatus" in path:
            continue
        with open(path) as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                info = ev.get("Task Info") or {}
                tm = ev.get("Task Metrics") or {}
                tasks.append(
                    (
                        info.get("Launch Time", 0),
                        (info.get("Finish Time", 0) - info.get("Launch Time", 0))
                        / 1e3,
                        (tm.get("Executor CPU Time", 0)) / 1e9,
                    )
                )

    for name, (t0, t1, wall) in windows.items():
        tw = sum(w for lt, w, _ in tasks if t0 <= lt <= t1)
        tc = sum(c for lt, _, c in tasks if t0 <= lt <= t1)
        print(
            "ADJ " + json.dumps(
                {
                    "query": name,
                    "wall_s": round(wall, 3),
                    "task_wall_s": round(tw, 2),
                    "task_cpu_s": round(tc, 2),
                    "cpu_over_wall": round(tc / tw, 3) if tw else None,
                }
            )
        )


if __name__ == "__main__":
    main()
