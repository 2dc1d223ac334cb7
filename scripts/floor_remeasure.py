#!/usr/bin/env python
"""Clean-window re-measurement of contended bench floors (r14,
VERDICT r13 task 2): min-of-N timing of the named queries WITH the
event log on, so every sample carries its own task cpu/wall
adjudication (CLAUDE.md rule — cpu~=wall => real measurement,
cpu<<wall => hypervisor contention; only cpu/wall >= 0.9 samples may
set a floor).

Usage: python scripts/floor_remeasure.py [query ...] [--n N]
Defaults to the three r13-flagged queries.

Prints one JSON line per query:
  {"query": ..., "samples": [...], "min": s, "min_cpu_wall": r,
   "best_clean": s, "best_clean_cpu_wall": r}
where best_clean is the fastest sample whose cpu/wall >= 0.9.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = [a for a in sys.argv[1:] if not a.startswith("--")]
QUERIES = args or [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "corpus_epoch_shuffle",
]
N = 6
for a in sys.argv[1:]:
    if a.startswith("--n="):
        N = int(a.split("=", 1)[1])
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVLOG = "/tmp/floor_remeasure_evlog"


def _window_stats(evdir: str, t0_ms: float, t1_ms: float):
    """Sum task wall + executor cpu over TaskEnd records whose launch
    falls in [t0,t1] (the measured window), walking every event file
    (Spark 4 logs per-app dirs; compress/rolling are forced off)."""
    wall = 0.0
    cpu = 0.0
    for root, _dirs, files in os.walk(evdir):
        for fn in files:
            if fn.startswith("."):
                continue
            with open(os.path.join(root, fn)) as fh:
                for line in fh:
                    if '"SparkListenerTaskEnd"' not in line:
                        continue
                    ev = json.loads(line)
                    ti = ev.get("Task Info", {})
                    if not (t0_ms <= ti.get("Launch Time", 0) <= t1_ms):
                        continue
                    wall += (ti.get("Finish Time", 0)
                             - ti.get("Launch Time", 0)) / 1e3
                    tm = ev.get("Task Metrics") or {}
                    cpu += tm.get("Executor CPU Time", 0) / 1e9
    return wall, cpu


def main() -> None:
    shutil.rmtree(EVLOG, ignore_errors=True)
    os.makedirs(EVLOG)

    from pyspark.sql import SparkSession

    from __spark_entry__ import queries

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("floor-remeasure")
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

    # one unmeasured warm pass for worker spin-up / classloading
    qs["scan_filter_project"](spark, SF_DIR).count()

    results = []
    for name in QUERIES:
        samples = []
        for _ in range(N):
            t0 = time.time()
            p0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - p0
            t1 = time.time()
            spark.catalog.clearCache()
            # flush listener queue so the event file has our tasks
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
            wall, cpu = _window_stats(EVLOG, t0 * 1e3, t1 * 1e3)
            ratio = (cpu / wall) if wall > 0 else None
            samples.append({"sec": round(dt, 3),
                            "cpu_wall": round(ratio, 3) if ratio else None})
            print(f"  {name}: {dt:.2f}s cpu/wall="
                  f"{ratio if ratio else float('nan'):.2f}",
                  file=sys.stderr)
        best = min(samples, key=lambda s: s["sec"])
        clean = [s for s in samples if (s["cpu_wall"] or 0) >= 0.9]
        best_clean = min(clean, key=lambda s: s["sec"]) if clean else None
        results.append({
            "query": name,
            "samples": samples,
            "min": best["sec"],
            "min_cpu_wall": best["cpu_wall"],
            "best_clean": best_clean["sec"] if best_clean else None,
            "best_clean_cpu_wall": (
                best_clean["cpu_wall"] if best_clean else None
            ),
        })
        print(json.dumps(results[-1]))
    spark.stop()


if __name__ == "__main__":
    main()
