"""Continuously-maintained PRIORITY SAMPLE: a stream of weighted rows
folded into a standing per-group DLT sample per micro-batch,
exactly-once — the live "representative subsample + unbiased totals"
table a monitoring or eval-curation pipeline reads instead of the
unbounded history.

Same proven composition as ``streaming/leaderboard.py``: per batch,
:func:`snapshots.maintain_priority_sample` merges the batch into the
standing bottom-(k+1) table (insert-only self-maintainability of
priority keys — the non-sample history is never re-read; the retained
rank-(k+1) row keeps the DLT threshold, hence every estimator weight,
derivable from the standing table alone), the result lands as a new
snapshot version whose pointer atomically carries the batch id (crash
at any point ⇒ replay reruns or skips, never double-unions), and
``vacuum_every``/``keep_last`` bounds version history. State per group
is exactly k+1 rows forever.

Priorities must arrive precomputed (``key_col`` — u·2^20 div w, the
:func:`operators.corpus.priority_sample` integer contract): the sink
merges; it does not re-derive weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hadoopxmlextractor_spark.snapshots import (
    last_committed_batch,
    latest_version,
    maintain_priority_sample,
    read_snapshot,
    vacuum,
    write_snapshot,
)


def make_sample_sink(
    table_dir: str,
    group_col: str,
    id_col: str,
    key_col: str,
    *,
    k: int,
    vacuum_every: int | None = None,
    keep_last: int = 3,
):
    """foreachBatch function: standing bottom-(k+1) ∪ batch → new
    version, skipped when this batch_id already committed."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(table_dir):
            return  # replayed after restart — version already durable
        batch = batch_df.select(group_col, id_col, key_col)
        if latest_version(table_dir) is None:
            merged = maintain_priority_sample(
                batch.limit(0), batch, group_col, id_col, key_col, k=k
            )
        else:
            standing = read_snapshot(batch_df.sparkSession, table_dir).drop(
                "rank"
            )
            merged = maintain_priority_sample(
                standing, batch, group_col, id_col, key_col, k=k
            )
        write_snapshot(merged, table_dir, batch_id=batch_id)
        if vacuum_every and batch_id > 0 and batch_id % vacuum_every == 0:
            vacuum(table_dir, keep_last=keep_last)

    return sink


def sample_stream(
    stream: DataFrame,
    table_dir: str,
    group_col: str,
    id_col: str,
    key_col: str,
    *,
    k: int,
    checkpoint_dir: str,
    vacuum_every: int | None = None,
    keep_last: int = 3,
    available_now: bool = False,
):
    """Start the continuous sample maintenance: returns the
    StreamingQuery. ``available_now`` drains what has landed and
    terminates (the generational-ingest trigger) instead of running
    continuously."""
    writer = stream.writeStream.foreachBatch(
        make_sample_sink(
            table_dir, group_col, id_col, key_col, k=k,
            vacuum_every=vacuum_every, keep_last=keep_last,
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return (
        writer.option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
