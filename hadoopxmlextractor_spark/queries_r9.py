"""Round-9 queries — modern web media containers:

- MP4/ISO-BMFF box walk (moov/mvhd timing, trak/tkhd dims, stsd codec
  fourcc, stts frame counts) — the dominant crawled-video container;
- WebM/Matroska EBML walk (TimestampScale + Duration, video
  TrackEntry dims + CodecID, SimpleBlock frame counts) — the second;
- WebP RIFF walk (simple lossy VP8, simple lossless VP8L, extended
  VP8X with alpha/animation flags) — the most common crawled image
  format after JPEG/PNG;
- M4A/AAC audio metadata over the same MP4 box walk (AudioSampleEntry
  + esds bitrate), unifying with the r8 audio tier;
- ID3v2 TEXT frames (title/artist/album/year over v2.3 and v2.4 with
  all three text encodings) — the content-metadata tier above the r8
  size/duration walks.

All header-only walks (no codec work) dispatched from the existing
`video_container_meta` / `audio_container_meta` Arrow passes in
:mod:`operators.multimodal`, with parsers + md5-parameterized
synthesizers in :mod:`operators.containers`. Fresh module per the r7
verdict rule (new operators must not churn certified modules); every
entry carries an exact DuckDB oracle replaying the synth parameters
with integer arithmetic.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (pandas_udf string annotations)

import pandas as pd  # noqa: F401  (pandas_udf string annotations)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from hadoopxmlextractor_spark.queries import query
from hadoopxmlextractor_spark.tables import load

_MD5B = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), "
    "{pos}, 2)) AS BIGINT)"
)


def _b(salt: str, k: int) -> str:
    """SQL for byte k of md5(doc_id:salt) — the synth parameter replay."""
    return _MD5B.format(salt=salt, pos=2 * k + 1)


@query(
    "multimodal_video_mp4_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('mp4', 0)} AS b0, {_b('mp4', 1)} AS b1,
             {_b('mp4', 2)} AS b2, {_b('mp4', 3)} AS b3,
             {_b('mp4', 4)} AS b4, {_b('mp4', 5)} AS b5,
             {_b('mp4', 10)} AS b10
      FROM documents
    )
    SELECT doc_id AS media_id,
           (['avc1','hev1','vp09','av01'])[b5 % 4 + 1] AS codec,
           CAST(16 * (b0 % 40 + 1) AS INT) AS width,
           CAST(16 * (b1 % 24 + 1) AS INT) AS height,
           CAST(NULL AS INT) AS fps_num, CAST(NULL AS INT) AS fps_den,
           CAST(10 + b3 % 90 AS BIGINT) AS n_frames,
           CAST((([600,1000,90000,30000])[b2 % 4 + 1] * (1 + b10 % 10) + b4)
                * 1000 // ([600,1000,90000,30000])[b2 % 4 + 1] AS BIGINT)
             AS duration_ms
    FROM p
    """,
)
def q_multimodal_video_mp4_meta(spark: SparkSession, sf: str) -> DataFrame:
    # MP4/ISO-BMFF — the container of essentially all modern crawled
    # video (r8 verdict item 4): box walk to moov/mvhd (timescale +
    # duration, v0 32-bit AND v1 64-bit layouts), the 'vide' trak's
    # tkhd 16.16 dims, stsd first-entry codec fourcc (avc1/hev1/vp09/
    # av01 rotate by doc), and stts sample counts (1- and 2-entry
    # tables rotate). Layout rotations — interleaved free box, audio-
    # track-first ordering — keep the walk honest; fps stays NULL
    # because MP4 headers carry no global fps (duration + frame count
    # are the facts). Same shape as the shipped AVI walk
    # (multimodal._parse_avi_meta); duration uses NON-ROUND units
    # (ts·(1+b10%10)+b4) so the // timescale conversion is live.
    from hadoopxmlextractor_spark.operators import containers as C
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    return M.video_container_meta(C.synth_mp4_video(docs))


@query(
    "multimodal_video_webm_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('webm', 0)} AS b0, {_b('webm', 1)} AS b1,
             {_b('webm', 2)} AS b2, {_b('webm', 3)} AS b3,
             {_b('webm', 4)} AS b4, {_b('webm', 5)} AS b5,
             {_b('webm', 7)} AS b7
      FROM documents
    )
    SELECT doc_id AS media_id,
           (['V_VP8','V_VP9','V_AV1','V_MPEG4/ISO/AVC'])[b2 % 4 + 1]
             AS codec,
           CAST(16 * (b0 % 40 + 1) AS INT) AS width,
           CAST(16 * (b1 % 24 + 1) AS INT) AS height,
           CAST(NULL AS INT) AS fps_num, CAST(NULL AS INT) AS fps_den,
           CAST(1 + b7 % 8 AS BIGINT) AS n_frames,
           CAST((1000 * (1 + b4 % 20) + b5)
                * ([1000000,500000,100000])[b3 % 3 + 1]
                // 1000000 AS BIGINT) AS duration_ms
    FROM p
    """,
)
def q_multimodal_video_webm_meta(spark: SparkSession, sf: str) -> DataFrame:
    # WebM/Matroska — the second modern web video container (r8
    # verdict item 7): EBML varint walk through the header (DocType
    # must be webm/matroska), Segment/Info (TimestampScale rotates
    # 1e6/5e5/1e5 ns so the ms conversion is live; Duration rotates
    # float32/float64 encodings, pinned to exactly-representable
    # integer values — no float crosses the oracle boundary), the
    # video TrackEntry (PixelWidth/PixelHeight + CodecID), and a
    # Cluster walk counting the video track's SimpleBlocks as frames.
    # Rotations: Void padding, Info/Tracks order swap, and an audio
    # TrackEntry whose blocks must NOT count.
    from hadoopxmlextractor_spark.operators import containers as C
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    return M.video_container_meta(C.synth_webm_video(docs))


@query(
    "multimodal_image_webp_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('webp', 0)} AS b0, {_b('webp', 1)} AS b1,
             {_b('webp', 2)} AS b2, {_b('webp', 3)} AS b3,
             {_b('webp', 4)} AS b4, {_b('webp', 5)} AS b5,
             {_b('webp', 6)} AS b6, {_b('webp', 7)} AS b7
      FROM documents
    )
    SELECT doc_id AS media_id,
           CASE b0 % 3 WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l'
                ELSE 'vp8x' END AS format,
           CAST(CASE b0 % 3
                WHEN 0 THEN 1 + (b1 * 64 + b2) % 16383
                WHEN 1 THEN 1 + (b1 * 64 + b2) % 16384
                ELSE 1 + (b1 * 256 + b2) % 100000 END AS INT) AS width,
           CAST(CASE b0 % 3
                WHEN 0 THEN 1 + (b3 * 64 + b4) % 16383
                WHEN 1 THEN 1 + (b3 * 64 + b4) % 16384
                ELSE 1 + (b3 * 256 + b4) % 100000 END AS INT) AS height,
           (b0 % 3 <> 0 AND b5 % 2 = 1) AS has_alpha,
           (b0 % 3 = 2 AND b6 % 2 = 1) AS is_animated,
           (b0 % 3 = 1 OR (b0 % 3 = 2 AND b7 % 2 = 1)) AS is_lossless,
           CAST(CASE WHEN b0 % 3 = 2 THEN 2 + b5 % 2 + b6 % 2
                ELSE 1 END AS INT) AS n_chunks
    FROM p
    """,
)
def q_multimodal_image_webp_meta(spark: SparkSession, sf: str) -> DataFrame:
    # WebP — the most common crawled image format after JPEG/PNG (r8
    # verdict item 5): RIFF chunk walk covering all three container
    # variants, rotating by doc — simple lossy 'VP8 ' (frame tag +
    # 0x9D012A start code + 14-bit dims), simple lossless 'VP8L'
    # (0x2F signature + 14-bit dims + alpha bit), and extended 'VP8X'
    # (feature flag byte → alpha 0x10 / animation 0x02, 24-bit canvas
    # dims, lossless from the presence of a VP8L payload chunk, ANIM/
    # ALPH side chunks counted). Dims/flags are header facts; VP8/
    # VP8L sample decode stays the plug-in point like other refused
    # codecs. Booleans are always non-NULL on parsed rows (the
    # NULL-boolean stringification trap never arises).
    from hadoopxmlextractor_spark.operators import containers as C

    docs = load(spark, sf, "documents")
    return C.webp_meta(C.synth_webp_images(docs))


@query(
    "multimodal_audio_m4a_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('m4a', 0)} AS b0, {_b('m4a', 1)} AS b1,
             {_b('m4a', 2)} AS b2, {_b('m4a', 3)} AS b3,
             {_b('m4a', 6)} AS b6, {_b('m4a', 7)} AS b7
      FROM documents
    )
    SELECT doc_id AS media_id, 'aac' AS codec,
           CAST(([8000,16000,22050,24000,32000,44100,48000])[b0 % 7 + 1]
                AS INT) AS sample_rate,
           CAST(1 + b1 % 2 AS INT) AS channels,
           CAST(16 AS INT) AS sample_bits,
           CAST(100 + b3 % 900 AS BIGINT) AS n_units,
           CAST(32 + b2 % 288 AS INT) AS bitrate_kbps,
           FALSE AS is_vbr,
           CAST((([8000,16000,22050,24000,32000,44100,48000])[b0 % 7 + 1]
                 * (1 + b6 % 10) + b7) * 1000
                // ([8000,16000,22050,24000,32000,44100,48000])[b0 % 7 + 1]
             AS BIGINT) AS duration_ms,
           CAST(NULL AS BIGINT) AS meta_bytes
    FROM p
    """,
)
def q_multimodal_audio_m4a_meta(spark: SparkSession, sf: str) -> DataFrame:
    # M4A/AAC — MP4 audio over the SAME box walk as the video leg,
    # unifying the r8 audio tier with the r9 container work: the
    # 'soun' trak's AudioSampleEntry (channel count, 16-bit samples,
    # 16.16 fixed-point sample rate), the esds avgBitrate field, stts
    # sample counts, and mvhd duration at a timescale equal to the
    # sample rate (units ts·(1+b6%10)+b7, non-round ms so the //
    # conversion is live). Dispatched from audio_container_meta on the
    # ftyp magic — the audio tier's codec-NULL marker contract holds
    # for M4A files too.
    from hadoopxmlextractor_spark.operators import containers as C
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    return M.audio_container_meta(C.synth_m4a_audio(docs))


def _webp_ahash_oracle() -> str:
    from hadoopxmlextractor_spark import oracles as O

    return O.image_ahash_oracle(side=8)


@query("multimodal_webp_lossless_ahash", _webp_ahash_oracle())
def q_multimodal_webp_lossless_ahash(spark: SparkSession, sf: str) -> DataFrame:
    # VP8L — WebP lossless DECODED natively (r8 verdict item 5's
    # stretch goal), extending the PNG/GIF/BMP/JPEG codec lineage to
    # the most common modern crawled image format: per document the
    # SAME md5 pixel plane as synth_ppm_media goes through the real
    # VP8L encoder (canonical prefix codes over complete flat length
    # assignments, LSB-first bitstream, subtract-green transform
    # rotating by doc parity) and back through the real decoder
    # (simple + code-length-coded prefix codes, LZ77 backrefs, color
    # cache, inverse subtract-green) before the shared integer aHash —
    # so the PPM aHash oracle applies VERBATIM and one wrong bit in
    # either codec half flips the 64-bit hash. Predictor/color/
    # color-indexing transforms, meta prefix codes, and the 2D
    # near-pixel distance table refuse to the plug-in point (NULL
    # marker), the same contract as arithmetic JPEG.
    from hadoopxmlextractor_spark.operators import multimodal as M
    from hadoopxmlextractor_spark.operators import vp8l as V

    docs = load(spark, sf, "documents")
    media = V.synth_webp_lossless_media(docs, side=8)
    return M.image_ahash(media)


@query(
    "multimodal_audio_id3_tags",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('id3', 0)} AS b0, {_b('id3', 1)} AS b1,
             {_b('id3', 2)} AS b2, {_b('id3', 3)} AS b3,
             {_b('id3', 5)} AS b5, {_b('id3', 6)} AS b6
      FROM documents
    )
    SELECT doc_id AS media_id,
           '2.' || CAST(2 + b0 % 3 AS VARCHAR) AS id3_version,
           (['café nights','alpha song','Überlied','plain tune',
             'naïve waltz'])[b2 % 5 + 1] AS title,
           (['bravo band','charlie choir','delta duo'])[b3 % 3 + 1]
             AS artist,
           'album ' || CAST(b5 % 10 AS VARCHAR) AS album,
           CAST(1990 + b6 % 40 AS VARCHAR) AS year
    FROM p
    """,
)
def q_multimodal_audio_id3_tags(spark: SparkSession, sf: str) -> DataFrame:
    # ID3v2 TEXT frames (r9) — the content-metadata tier above the r8
    # size/duration walk: title/artist/album/year are what a corpus
    # pipeline joins against transcripts and licensing tables. The
    # fixtures rotate every axis that breaks naive parsers: v2.2 vs
    # v2.3 vs v2.4 (r10 — 3-byte ids/sizes vs 4-byte ids with
    # big-endian vs SYNCSAFE sizes; mixing any two misparses every
    # multi-frame tag), text encodings latin-1 / UTF-16-with-BOM /
    # UTF-8 (non-ASCII titles keep each codec branch honest; v2.2
    # predates UTF-8 so it rotates two), frame order, year frame id
    # (TYE vs TYER vs TDRC), and a 64-byte padding region the walk
    # must stop at. One Arrow pass; untagged blobs degrade to the
    # version-NULL marker row.
    from hadoopxmlextractor_spark.operators import containers as C

    docs = load(spark, sf, "documents")
    return C.audio_id3_tags(C.synth_id3_mp3(docs))
