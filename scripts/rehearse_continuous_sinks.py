#!/usr/bin/env python
"""Long-running rehearsal of the continuous snapshot-store sinks
(round-5 verdict item 3): the incremental operators are 3x/10x
rehearsed per-merge, but a sink that runs for months commits hundreds
of versions — this script drives the session-table and leaderboard
sinks for N micro-batches as direct foreachBatch-function calls
(the snapshot-store round-trips ARE the cost under test; Spark's
streaming machinery adds a constant on top) and measures the
per-batch wall-time curve WITH and WITHOUT a periodic vacuum, plus
the version-directory count each policy leaves behind.

What should grow without vacuum: the version-directory count (one
full copy-on-write snapshot per batch) and with it the O(#versions)
directory listing in version allocation plus unbounded storage. What
must NOT grow: the merge itself (leaderboard state is k x groups
forever; the session table grows only with genuine sessions).

Usage: PYTHONPATH=. python scripts/rehearse_continuous_sinks.py \
          [n_batches] [vacuum_every] [keep_last]
Prints one summary table (also the source of the SCALE.md entry).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from hadoopxmlextractor_spark.snapshots import vacuum
from hadoopxmlextractor_spark.streaming.leaderboard import make_leaderboard_sink
from hadoopxmlextractor_spark.streaming.sessions import make_session_table_sink

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 120
VACUUM_EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 10
KEEP_LAST = int(sys.argv[3]) if len(sys.argv) > 3 else 3
EVENTS_PER_BATCH = 200
USERS = 50
GAP_MS = 1_000
WINDOW = 20  # batches per reporting window (median of window)


def session_batch(spark, b: int):
    """200 events for 50 users; each batch advances every user's clock
    by 2x the gap, so every batch extends/creates genuine sessions and
    the standing table grows linearly — the honest worst case."""
    base = b * 2 * GAP_MS
    rows = [
        (u, b * EVENTS_PER_BATCH + i, base + (i // USERS) * 100)
        for i, u in enumerate(
            (i % USERS) for i in range(EVENTS_PER_BATCH)
        )
    ]
    return spark.createDataFrame(rows, "user_id long, event_id long, ms long")


def board_batch(spark, b: int):
    rows = [
        (f"g{i % 10}", b * EVENTS_PER_BATCH + i, (b * 37 + i * 101) % 10_000)
        for i in range(EVENTS_PER_BATCH)
    ]
    return spark.createDataFrame(rows, "grp string, id long, v long")


def n_versions(table_dir: str) -> int:
    return sum(1 for d in os.listdir(table_dir) if d.startswith("v="))


def dir_bytes(table_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(table_dir):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def run(spark, workdir: str, kind: str, do_vacuum: bool) -> dict:
    table = os.path.join(workdir, f"{kind}_{'vac' if do_vacuum else 'novac'}")
    shutil.rmtree(table, ignore_errors=True)
    if kind == "sessions":
        sink = make_session_table_sink(table, gap_ms=GAP_MS)
        mk = session_batch
    else:
        sink = make_leaderboard_sink(table, "grp", "id", "v", k=10)
        mk = board_batch
    windows = []
    times = []
    for b in range(N_BATCHES):
        df = mk(spark, b)
        t0 = time.monotonic()
        sink(df, b)
        if do_vacuum and b > 0 and b % VACUUM_EVERY == 0:
            vacuum(table, keep_last=KEEP_LAST)
        times.append(time.monotonic() - t0)
        if len(times) == WINDOW:
            times.sort()
            windows.append(times[WINDOW // 2])
            times = []
    return {
        "kind": kind,
        "vacuum": do_vacuum,
        "window_medians_s": [round(w, 3) for w in windows],
        "versions_left": n_versions(table),
        "store_mb": round(dir_bytes(table) / 1e6, 1),
    }


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("continuous-sink-rehearsal")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = os.environ.get("SINK_REHEARSAL_DIR", "/tmp/sink_rehearsal")
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    t0 = time.monotonic()
    results = [
        run(spark, workdir, kind, v)
        for kind in ("leaderboard", "sessions")
        for v in (False, True)
    ]
    print(
        f"\n{N_BATCHES} micro-batches per scenario, vacuum every "
        f"{VACUUM_EVERY} keeping {KEEP_LAST}, medians per {WINDOW}-batch window"
    )
    for r in results:
        tag = "vacuum" if r["vacuum"] else "no vacuum"
        print(
            f"{r['kind']:<12} {tag:<10} versions={r['versions_left']:<4} "
            f"store={r['store_mb']:>7.1f} MB  medians={r['window_medians_s']}"
        )
    print(f"TOTAL {time.monotonic() - t0:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
