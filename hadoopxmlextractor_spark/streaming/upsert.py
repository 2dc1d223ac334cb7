"""Streaming MERGE into the versioned snapshot store — the lakehouse
tail of a continuous ingestion pipeline: each micro-batch commits one
new snapshot version via ``foreachBatch`` + :func:`snapshots.
commit_upsert`, with IDEMPOTENT batch replay so restarts keep
exactly-once table state.

Why the pointer carries the batch id: Structured Streaming's contract
after a crash is at-least-once delivery INTO foreachBatch — the last
uncommitted batch is replayed with the SAME batch_id. The snapshot
pointer file commits ``{"version": N, "last_batch_id": b}`` in ONE
atomic rename (:func:`snapshots._flip_pointer`), so "the version is
durable" and "the batch is marked committed" are indivisible: replay
either reruns the whole batch (pointer untouched — any orphan
parquet directory from the crash is ignored by version allocation)
or skips it entirely. Offsets log + idempotent sink = exactly-once
end to end (the documented Spark recipe, implemented against our own
table format). A SEPARATE marker file would reopen the window: a
crash between version flip and marker write replays the batch into a
table that already absorbed it.

The ``_stream_commits.json`` marker helpers below remain ONLY for the
staged-commit index sinks (``streaming/export.py`` IVF cells / band
tree) whose on-disk layout is a partition tree, not a versioned
snapshot — their atomicity comes from rename-per-file staging, and
the marker is written after the moves (see ``_commit_staged_tree``).

Scale: commit_upsert is copy-on-write, so micro-batch cadence should
be minutes, not seconds, at 100 TB (or land into hourly partitions
and MERGE on a schedule); the pattern is unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from hadoopxmlextractor_spark.snapshots import commit_upsert, last_committed_batch

__all__ = ["make_upsert_sink", "upsert_stream", "last_committed_batch"]


def _marker_path(table_dir: str) -> str:
    """Marker file for the staged-commit INDEX sinks (IVF/band tree)
    only — snapshot-store sinks commit the batch id inside the
    version pointer instead (see module docstring)."""
    return os.path.join(table_dir, "_stream_commits.json")


def last_committed_index_batch(index_dir: str) -> int:
    """Read the staged-commit marker of an index tree (IVF cells /
    MinHash bands), or -1."""
    try:
        with open(_marker_path(index_dir)) as f:
            return json.load(f)["last_batch_id"]
    except (FileNotFoundError, KeyError, json.JSONDecodeError):
        return -1


def make_upsert_sink(
    table_dir: str,
    id_col: str,
    *,
    delete_col: str | None = None,
    vacuum_every: int | None = None,
    keep_last: int = 3,
):
    """The foreachBatch function: MERGE the batch as a new snapshot
    version unless this batch_id already committed (crash replay).
    Version + batch id land in one atomic pointer rename, so there is
    no crash point at which the batch can double-apply.
    ``vacuum_every``/``keep_last``: reclaim old versions every N
    committed batches (post-commit, crash-safe — measured curve in
    SCALE.md §continuous-sinks)."""
    from hadoopxmlextractor_spark.snapshots import vacuum

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(table_dir):
            return  # replayed after restart — version already durable
        commit_upsert(
            batch_df.sparkSession,
            table_dir,
            batch_df,
            id_col,
            delete_col=delete_col,
            batch_id=batch_id,
        )
        if vacuum_every and batch_id > 0 and batch_id % vacuum_every == 0:
            vacuum(table_dir, keep_last=keep_last)

    return sink


def upsert_stream(
    stream: DataFrame,
    table_dir: str,
    id_col: str,
    *,
    checkpoint_dir: str,
    delete_col: str | None = None,
    vacuum_every: int | None = None,
    keep_last: int = 3,
):
    """Start the continuous MERGE: returns the StreamingQuery."""
    return (
        stream.writeStream.foreachBatch(
            make_upsert_sink(
                table_dir, id_col, delete_col=delete_col,
                vacuum_every=vacuum_every, keep_last=keep_last,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
