"""Continuous top-k leaderboard: a stream of (group, id, value) rows
maintained as a standing per-group top-k TABLE in the versioned
snapshot store, exactly-once.

Composition of proven pieces rather than new machinery: per
micro-batch, :func:`snapshots.maintain_topk` folds the batch into the
standing table (insert-only self-maintainability: topk(all) =
topk(standing ∪ batch)), and the result lands as a NEW snapshot
version (the leaderboard is k×groups rows — version cost is
leaderboard-sized, never history-sized) whose pointer commits the
version and the batch id in ONE atomic rename: crash replay either
reruns the whole merge from the still-current version or is a no-op,
never a second union of an already-absorbed batch (which could seat
the same row twice in the top-k). Offsets log + idempotent sink =
exactly-once standing state, the same contract as
``streaming/upsert.py``.

Scale: state per group is exactly k rows FOREVER (displaced rows are
gone — valid because the stream is insert-only; deletes would need the
dirty-group recompute regime instead). Each micro-batch reads the
previous version (k×groups), one WindowGroupLimit rank, one snapshot
write. The unbounded event history is never re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hadoopxmlextractor_spark.snapshots import (
    last_committed_batch,
    latest_version,
    maintain_topk,
    read_snapshot,
    vacuum,
    write_snapshot,
)


def make_leaderboard_sink(
    table_dir: str,
    group_col: str,
    id_col: str,
    val_col: str,
    *,
    k: int,
    vacuum_every: int | None = None,
    keep_last: int = 3,
):
    """foreachBatch function: standing top-k ∪ batch → new version,
    skipped entirely when this batch_id already committed. The merge
    plan writes DIRECTLY from v=N to v=N+1 — the sessions sink and
    ``commit_upsert`` already exercise the read-old-write-new shape
    (different directories; no driver-side materialization).
    ``vacuum_every``/``keep_last``: reclaim old versions every N
    committed batches (post-commit, crash-safe — see the sessions
    sink docstring and SCALE.md §continuous-sinks)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(table_dir):
            return  # replayed after restart — version already durable
        spark = batch_df.sparkSession
        batch = batch_df.select(group_col, id_col, val_col)
        if latest_version(table_dir) is None:
            merged = maintain_topk(
                batch.limit(0), batch, group_col, id_col, val_col, k=k
            )
        else:
            standing = read_snapshot(spark, table_dir)
            merged = maintain_topk(
                standing, batch, group_col, id_col, val_col, k=k
            )
        write_snapshot(merged, table_dir, batch_id=batch_id)
        if vacuum_every and batch_id > 0 and batch_id % vacuum_every == 0:
            vacuum(table_dir, keep_last=keep_last)

    return sink


def leaderboard_stream(
    stream: DataFrame,
    table_dir: str,
    group_col: str,
    id_col: str,
    val_col: str,
    *,
    k: int,
    checkpoint_dir: str,
    vacuum_every: int | None = None,
    keep_last: int = 3,
):
    """Start the continuous leaderboard: returns the StreamingQuery."""
    return (
        stream.writeStream.foreachBatch(
            make_leaderboard_sink(
                table_dir, group_col, id_col, val_col, k=k,
                vacuum_every=vacuum_every, keep_last=keep_last,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
