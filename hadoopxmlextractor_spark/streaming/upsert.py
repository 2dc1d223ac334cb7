"""Streaming MERGE into the versioned snapshot store — the lakehouse
tail of a continuous ingestion pipeline: each micro-batch commits one
new snapshot version via ``foreachBatch`` + :func:`snapshots.
commit_upsert`, with IDEMPOTENT batch replay so restarts keep
exactly-once table state.

Why the marker: Structured Streaming's contract after a crash is
at-least-once delivery INTO foreachBatch — the last uncommitted batch
is replayed with the SAME batch_id. The sink records the highest
committed batch_id in ``_stream_commits.json`` (written tmp+rename,
same atomicity discipline as the snapshot pointer) and skips any
batch at or below it, turning replays into no-ops: offsets log +
idempotent sink = exactly-once end to end (the documented Spark
recipe, implemented against our own table format).

Scale: commit_upsert is copy-on-write, so micro-batch cadence should
be minutes, not seconds, at 100 TB (or land into hourly partitions
and MERGE on a schedule); the pattern is unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from hadoopxmlextractor_spark.snapshots import commit_upsert


def _marker_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_stream_commits.json")


def last_committed_batch(table_dir: str) -> int:
    try:
        with open(_marker_path(table_dir)) as f:
            return json.load(f)["last_batch_id"]
    except (FileNotFoundError, KeyError, json.JSONDecodeError):
        return -1


def make_upsert_sink(table_dir: str, id_col: str, *, delete_col: str | None = None):
    """The foreachBatch function: MERGE the batch as a new snapshot
    version unless this batch_id already committed (crash replay)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(table_dir):
            return  # replayed after restart — version already durable
        commit_upsert(
            batch_df.sparkSession, table_dir, batch_df, id_col, delete_col=delete_col
        )
        tmp = _marker_path(table_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_batch_id": batch_id}, f)
        os.replace(tmp, _marker_path(table_dir))

    return sink


def upsert_stream(
    stream: DataFrame,
    table_dir: str,
    id_col: str,
    *,
    checkpoint_dir: str,
    delete_col: str | None = None,
):
    """Start the continuous MERGE: returns the StreamingQuery."""
    return (
        stream.writeStream.foreachBatch(
            make_upsert_sink(table_dir, id_col, delete_col=delete_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
