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
    sidecar and landed in its cell partitions through a STAGED COMMIT.
    Exactly-once is offsets-log + idempotent sink: foreachBatch alone
    is at-least-once (a crash between the write and the offset commit
    replays the batch with the same batch_id), and a blind re-append
    would duplicate vectors in the index, changing later probe
    results. The sink therefore writes each batch in two phases:

    1. STAGE — the assigned batch lands under
       ``cells_staging/batch=<id>/centroid_id=<c>/``; a ``_STAGED``
       sentinel marks the Spark write complete. A crash here leaves
       the cell tree untouched, and replay discards the partial
       staging (no sentinel ⇒ rewrite from scratch).
    2. COMMIT — each staged parquet file is atomically RENAMED into
       its cell directory under a batch-prefixed name, then the
       highest committed batch_id marker updates (tmp+rename, the
       streaming.upsert discipline), then the staging dir is removed.
       Rename removes the file from staging, so every staged file
       exists in exactly one place at every instant: a crash mid-move
       resumes by moving only the REMAINING staged files — no
       duplicate is possible at any crash point, and a crash after the
       marker only leaves an empty staging dir to sweep.

    (Renames are same-filesystem atomic moves; on an object store the
    same protocol runs with the store's atomic copy+delete or a
    manifest commit.) The write touches only the cells that receive
    rows, so steady-state ingest cost tracks the arrival rate, not the
    index size; probes see new vectors at the next query with no
    rebuild, and never see a half-landed batch changing results
    mid-query plan."""
    def _sink(batch_df, batch_id: int) -> None:
        _ivf_staged_sink_body(index_dir, batch_df, batch_id, vec_col)

    return (
        vectors_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _ivf_staging_dir(index_dir: str, batch_id: int) -> str:
    return f"{index_dir}/cells_staging/batch={batch_id}"


def _ivf_stage_batch(index_dir: str, batch_df, batch_id: int, vec_col: str) -> None:
    """Phase 1: land the assigned batch under the staging dir and drop
    the ``_STAGED`` sentinel. The cell tree is untouched; any partial
    staging from a crashed prior attempt is discarded first."""
    import os
    import shutil

    import numpy as np

    from hadoopxmlextractor_spark.operators.similarity import ivf_assign

    staging = _ivf_staging_dir(index_dir, batch_id)
    shutil.rmtree(staging, ignore_errors=True)
    spark = batch_df.sparkSession
    cents = spark.read.parquet(f"{index_dir}/_centroids").collect()
    C = np.zeros((len(cents), len(cents[0]["centroid"])))
    for r in cents:
        C[r["centroid_id"]] = r["centroid"]
    ivf_assign(batch_df, C, vec_col=vec_col).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(staging)
    with open(f"{staging}/_STAGED", "w") as fh:
        fh.write("staged\n")


def _commit_staged_tree(
    index_dir: str,
    staging: str,
    tree: str,
    part_glob: str,
    batch_id: int,
) -> None:
    """Phase 2, generic over the partition tree (IVF cells, text-index
    bands): atomically rename every remaining staged parquet file into
    its partition directory (batch-prefixed name), then update the
    committed-batch marker (tmp+rename), then sweep the staging dir.
    Rename removes the source, so each staged file exists in exactly
    one place at every instant — resuming after a crash mid-move
    delivers only the files still in staging, never a duplicate."""
    import glob
    import json
    import os
    import shutil

    from hadoopxmlextractor_spark.streaming.upsert import _marker_path

    for cdir in sorted(glob.glob(f"{staging}/{part_glob}")):
        dest = f"{index_dir}/{tree}/{os.path.basename(cdir)}"
        os.makedirs(dest, exist_ok=True)
        for f in sorted(glob.glob(f"{cdir}/*.parquet")):
            os.replace(f, f"{dest}/b{batch_id}-{os.path.basename(f)}")
    tmp = _marker_path(index_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"last_batch_id": batch_id}, fh)
    os.replace(tmp, _marker_path(index_dir))
    shutil.rmtree(staging, ignore_errors=True)


def _ivf_commit_staged(index_dir: str, batch_id: int) -> None:
    _commit_staged_tree(
        index_dir,
        _ivf_staging_dir(index_dir, batch_id),
        "cells",
        "centroid_id=*",
        batch_id,
    )


def _ivf_staged_sink_body(
    index_dir: str, batch_df, batch_id: int, vec_col: str
) -> None:
    """The full per-batch protocol (stage if needed, then commit) —
    module-level so crash points between the phases are directly
    testable."""
    import os
    import shutil

    from hadoopxmlextractor_spark.streaming.upsert import (
        last_committed_index_batch,
    )

    if batch_id <= last_committed_index_batch(index_dir):
        # replayed after restart — batch already committed; sweep any
        # staging leftover from a crash between marker and rmtree
        shutil.rmtree(_ivf_staging_dir(index_dir, batch_id), ignore_errors=True)
        return
    sentinel = f"{_ivf_staging_dir(index_dir, batch_id)}/_STAGED"
    if not os.path.exists(sentinel):
        if batch_df.isEmpty():
            _ivf_commit_staged(index_dir, batch_id)  # marker-only commit
            return
        _ivf_stage_batch(index_dir, batch_df, batch_id, vec_col)
    # sentinel present: staged data is complete (possibly partially
    # moved by a crashed commit) — finish the move + marker + sweep
    _ivf_commit_staged(index_dir, batch_id)


# ---------------------------------------------------------------------------
# Continuous text band-index maintenance (the IVF protocol, band tree)
# ---------------------------------------------------------------------------


def stream_docs_into_band_index(
    docs_stream,
    index_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
):
    """Continuous maintenance of the persisted MinHash band index
    (:func:`operators.dedup.write_band_index`): each micro-batch's
    signatures land in their band partitions through the SAME staged
    commit as :func:`stream_vectors_into_ivf_index` — stage under
    ``bands_staging/batch=<id>/band=<b>/`` with a ``_STAGED``
    sentinel, then atomically rename into the band tree + marker +
    sweep — so a crash at any point leaves either no trace or a
    committed batch, never a duplicate signature row (a blind
    re-append would make replayed documents collide with themselves
    and inflate every later probe)."""

    def _sink(batch_df, batch_id: int) -> None:
        _band_staged_sink_body(
            index_dir, batch_df, batch_id,
            text_col, id_col, num_hashes, bands,
        )

    return (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _band_staging_dir(index_dir: str, batch_id: int) -> str:
    return f"{index_dir}/bands_staging/batch={batch_id}"


def _band_stage_batch(
    index_dir: str, batch_df, batch_id: int,
    text_col: str, id_col: str, num_hashes: int, bands: int,
) -> None:
    """Phase 1 for the band tree: signatures for the batch land under
    the staging dir with the ``_STAGED`` sentinel; partial staging
    from a crashed prior attempt is discarded first."""
    import shutil

    from hadoopxmlextractor_spark.streaming.dedup import corpus_minhash_index

    staging = _band_staging_dir(index_dir, batch_id)
    shutil.rmtree(staging, ignore_errors=True)
    corpus_minhash_index(
        batch_df, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands,
    ).write.mode("overwrite").partitionBy("band").parquet(staging)
    with open(f"{staging}/_STAGED", "w") as fh:
        fh.write("staged\n")


def _band_staged_sink_body(
    index_dir: str, batch_df, batch_id: int,
    text_col: str, id_col: str, num_hashes: int, bands: int,
) -> None:
    """Stage-then-commit per batch — module-level so crash points
    between the phases are directly testable (the IVF protocol)."""
    import os
    import shutil

    from hadoopxmlextractor_spark.streaming.upsert import (
        last_committed_index_batch,
    )

    staging = _band_staging_dir(index_dir, batch_id)
    if batch_id <= last_committed_index_batch(index_dir):
        shutil.rmtree(staging, ignore_errors=True)
        return
    if not os.path.exists(f"{staging}/_STAGED"):
        if batch_df.isEmpty():
            _commit_staged_tree(index_dir, staging, "bands", "band=*", batch_id)
            return
        _band_stage_batch(
            index_dir, batch_df, batch_id,
            text_col, id_col, num_hashes, bands,
        )
    _commit_staged_tree(index_dir, staging, "bands", "band=*", batch_id)
