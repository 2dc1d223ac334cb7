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


def doc_batch(spark, b: int):
    """40 synthetic docs per batch, unique ids, mildly-overlapping
    vocabulary so the MinHash signatures are non-degenerate."""
    rows = [
        (
            b * 40 + i,
            " ".join(f"w{(b * 17 + i * 7 + j) % 300}" for j in range(40)),
        )
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def n_versions(table_dir: str) -> int:
    return sum(1 for d in os.listdir(table_dir) if d.startswith("v="))


def n_files(root: str) -> int:
    return sum(len(fs) for _r, _d, fs in os.walk(root))


def run_band_index(spark, workdir: str, do_compact: bool, n_batches: int) -> dict:
    """The third continuous sink: staged-commit appends into the band
    tree. The growth axis here is FILES PER BAND (one per touched band
    per batch), not version directories — per-band compaction is the
    reclamation lever."""
    from hadoopxmlextractor_spark.operators.dedup import compact_band_index
    from hadoopxmlextractor_spark.streaming.export import _band_staged_sink_body

    index = os.path.join(workdir, f"bands_{'comp' if do_compact else 'nocomp'}")
    shutil.rmtree(index, ignore_errors=True)
    os.makedirs(index)
    windows, times = [], []
    for b in range(n_batches):
        df = doc_batch(spark, b)
        t0 = time.monotonic()
        _band_staged_sink_body(index, df, b, "text", "doc_id", 16, 8)
        if do_compact and b > 0 and b % VACUUM_EVERY == 0:
            compact_band_index(spark, index)
        times.append(time.monotonic() - t0)
        if len(times) == WINDOW:
            times.sort()
            windows.append(times[WINDOW // 2])
            times = []
    return {
        "kind": "band_index",
        "vacuum": do_compact,
        "window_medians_s": [round(w, 3) for w in windows],
        "versions_left": n_files(os.path.join(index, "bands")),
        "store_mb": round(dir_bytes(index) / 1e6, 1),
    }


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
    # band-index scenario is heavier per batch (stage+rename commit);
    # run it at half the batch count (env BAND_BATCHES overrides)
    band_batches = int(os.environ.get("BAND_BATCHES", max(N_BATCHES // 2, WINDOW)))
    results += [
        run_band_index(spark, workdir, c, band_batches) for c in (False, True)
    ]
    print(
        f"\n{N_BATCHES} micro-batches per scenario, vacuum every "
        f"{VACUUM_EVERY} keeping {KEEP_LAST}, medians per {WINDOW}-batch window"
    )
    for r in results:
        tag = "vacuum" if r["vacuum"] else "no vacuum"
        unit = "files" if r["kind"] == "band_index" else "versions"
        print(
            f"{r['kind']:<12} {tag:<10} {unit}={r['versions_left']:<5} "
            f"store={r['store_mb']:>7.1f} MB  medians={r['window_medians_s']}"
        )
    print(f"TOTAL {time.monotonic() - t0:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
