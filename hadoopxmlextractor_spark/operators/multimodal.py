"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, batch iteration, partition-friendly
UDF shapes — is real and tested. The actual media *decode* is stubbed:
this container has no image/audio codecs, so ``decode='real'`` raises
``NotImplementedError`` where PIL/librosa/ffmpeg would plug in, and
``decode='fake'`` runs a deterministic byte-level stand-in (16-bin byte
histogram) with the exact same dataflow, so the distributed pipeline is
exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, content binary, "
    "meta struct<source:string, n_bytes:long, declared_format:string>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, feature array<float>"
)

N_FEATURE_BINS = 16


def fake_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in media table: each document's utf-8 bytes
    become an opaque binary 'image'. Gives the multimodal operators a
    reproducible binary column without bundling real media."""
    source = F.col("source") if "source" in docs.columns else F.lit(None).cast("string")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            source.alias("source"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.lit("fake/raw").alias("declared_format"),
        ).alias("meta"),
    )


def extract_media_features(media: DataFrame, *, decode: str = "fake") -> DataFrame:
    """media(binary) → fixed-width feature vectors via mapInPandas.

    Batch shape is the real one for media work: one Arrow batch of
    binary blobs in, one batch of float vectors out; numpy does the
    per-batch math. Swap `_fake_features` for a PIL/torchvision decode
    to make it real — the Spark plumbing does not change.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use decode='fake' for the deterministic "
            "byte-histogram stand-in"
        )
    if decode != "fake":
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    import numpy as np

    def _fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            n_bytes = []
            for blob in pdf["content"]:
                arr = np.frombuffer(blob or b"", dtype=np.uint8)
                n_bytes.append(len(arr))
                if len(arr) == 0:
                    feats.append(np.zeros(N_FEATURE_BINS, dtype=np.float32))
                    continue
                hist, _ = np.histogram(arr, bins=N_FEATURE_BINS, range=(0, 256))
                feats.append((hist / len(arr)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(_fake_features, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling stand-in: slice each blob into fixed-size 'frames'
    (what video frame extraction looks like shape-wise: one input row →
    many output rows, done lazily per Arrow batch)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = blob or b""
                for i in range(0, max(len(blob), 1), every_n_bytes):
                    ids.append(mid)
                    idxs.append(i // every_n_bytes)
                    frames.append(blob[i : i + every_n_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(
        _frames, schema="media_id long, frame_idx int, frame binary"
    )


def resize_media(
    media: DataFrame, *, target_bytes: int = 1024, decode: str = "fake"
) -> DataFrame:
    """Resize stand-in: downsample each blob to ``target_bytes`` with a
    deterministic numpy stride (shape-wise what decode→resize→re-encode
    looks like: one row in, one smaller binary out, per Arrow batch).
    ``decode='real'`` is the PIL/ffmpeg plug-in point — stubbed here
    because this container ships no codecs."""
    if decode == "real":
        raise NotImplementedError(
            "real media resizing requires image/video codecs not present in "
            "this environment; use decode='fake' for the byte-stride stand-in"
        )
    if decode != "fake":
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                arr = np.frombuffer(blob or b"", dtype=np.uint8)
                if len(arr) <= target_bytes:
                    out.append(arr.tobytes())
                else:
                    idx = np.linspace(0, len(arr) - 1, target_bytes).astype(np.int64)
                    out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": out,
                }
            )

    return media.mapInPandas(
        _resize, schema="media_id long, media_type string, content binary"
    )
