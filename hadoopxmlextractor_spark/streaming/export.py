"""Continuous corpus ingestion → dedup → incremental shard export.

The streaming composition of the training-data pipeline's tail: as
document files land, cross-batch first-seen-wins dedup
(:mod:`streaming.dedup`'s keyed state) feeds the deterministic
training-shard layout (:func:`sinks.write_training_shards`'s stable
md5 bucketing) — each micro-batch APPENDS its fresh documents to the
``shard=N/`` JSONL directories, so a consumer always sees a
hash-sharded, duplicate-free corpus that only grows.

Why foreachBatch for the sink: shard membership must be the stable
bucket of the id (the resumability property the batch sink pins);
the JSON streaming sink cannot partition by a derived column AND keep
append atomicity per batch, while foreachBatch writes each batch's
shard partitions with the batch-scoped writer, giving exactly-once
per-batch appends under checkpoint recovery.

Scale: dedup state is the digest set (see dedup.py's state note —
RocksDB store / timeout for bounded deployments); the export itself is
stateless, one hash shuffle per batch on the shard key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hadoopxmlextractor_spark.operators.corpus import stable_bucket
from hadoopxmlextractor_spark.streaming.dedup import dedup_stream


def read_document_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming source of (doc_id, text) documents from JSONL files in
    a landing directory (the interchange format the shard sink writes)."""
    return (
        spark.readStream.schema("doc_id long, text string")
        .json(landing_dir)
        .select("doc_id", "text")
    )


def export_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    *,
    checkpoint_dir: str,
    n_shards: int = 32,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuously ingest, dedup across batches, and append to the
    deterministic shard layout. Returns the running query."""
    fresh = dedup_stream(read_document_stream(spark, landing_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("shard", stable_bucket("doc_id", n_shards))
            .repartition(F.col("shard"))
            .sortWithinPartitions("shard", "doc_id")
            .write.partitionBy("shard")
            .mode("append")
            .json(out_dir)
        )

    writer = fresh.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_vectors_into_ivf_index(
    vectors_stream,
    index_dir: str,
    checkpoint_dir: str,
    *,
    vec_col: str = "embedding",
):
    """Continuous vector-index maintenance: each micro-batch of newly
    embedded vectors is assigned with the index's STORED centroid
    sidecar and appended to its cell partitions
    (:func:`~hadoopxmlextractor_spark.operators.similarity.
    append_to_ivf_index` inside ``foreachBatch``). Exactly-once is
    offsets-log + IDEMPOTENT sink: foreachBatch alone is at-least-once
    (a crash between the append and the offset commit replays the
    batch with the same batch_id), and a blind re-append would
    duplicate vectors in the index, changing later probe results — so
    the sink records the highest committed batch_id in a marker file
    under the index (tmp+rename, the streaming.upsert discipline) and
    no-ops on replay. (Residual window: a crash BETWEEN the completed
    append and the marker rename still replays — the inherent limit of
    a non-transactional append sink; the upsert sink has no such
    window because MERGE replay is a state no-op. Close it at scale by
    landing appends through the snapshot store.) The append touches
    only the cells that receive rows, so steady-state ingest cost
    tracks the arrival rate, not the index size; probes see new
    vectors at the next query with no rebuild."""
    from hadoopxmlextractor_spark.operators.similarity import (
        append_to_ivf_index,
    )
    from hadoopxmlextractor_spark.streaming.upsert import (
        last_committed_batch,
        _marker_path,
    )

    def _sink(batch_df, batch_id: int) -> None:
        if batch_id <= last_committed_batch(index_dir):
            return  # replayed after restart — append already durable
        if not batch_df.isEmpty():
            append_to_ivf_index(
                batch_df.sparkSession, index_dir, batch_df, vec_col=vec_col
            )
        import json
        import os

        tmp = _marker_path(index_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_batch_id": batch_id}, f)
        os.replace(tmp, _marker_path(index_dir))

    return (
        vectors_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
