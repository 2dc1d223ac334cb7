"""Round-8 queries — crawl-scale ingestion, admission, and codecs:

- intra-file WARC splits (record-aligned ranged reads) and the
  WARC→WET composition;
- the audio metadata tier (MP3 incl. ID3v1/v2, Ogg Vorbis/Opus/FLAC
  over a live-CRC page walk, native FLAC, the WAV legs) and its video
  twin (AVI stream headers for raw/MJPEG/RLE8, Theora-in-Ogg);
- native codec legs: lossless JPEG (SOF3, 7 predictors, 8/12/16-bit),
  Microsoft RLE8 inter-frame video, sub-8-bit PNG;
- skew-adaptive joins, (lang, source)-scoped MinHash near-dup,
  SimHash LSH bucket observability, sliding exact count-distinct;
- admission & cleaning: RFC 9309 robots.txt, sitemap sources,
  language-ID confidence, mojibake fixpoint repair, CCNet perplexity
  buckets — composed end-to-end in `pipeline_crawl_to_corpus`.

Registered into the same QUERIES/ORACLE registry as the other query
modules; every entry carries an exact DuckDB oracle. Fresh module per
the r7 verdict (new operators must not churn certified modules).
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (pandas_udf string annotations)

import pandas as pd  # noqa: F401  (pandas_udf string annotations)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark import oracles as O
from hadoopxmlextractor_spark.queries import query
from hadoopxmlextractor_spark.tables import load


def _http_as_captured(
    body: bytes, arm: int, *, ctype: bytes = b"text/html"
) -> bytes:
    """One HTTP/1.1 200 response payload AS A CRAWLER STORES IT (r10):
    arm 0 = identity, 1 = Transfer-Encoding: chunked (two chunks, a
    chunk extension, a trailer header), 2 = Content-Encoding: gzip,
    3 = gzip then chunked — all four decode to the same entity bytes
    through ``split_http_payload``, so rotating the arm by doc leaves
    every downstream oracle untouched while proving the de-chunk /
    inflate path on each fixture generation. ``ctype`` lets charset
    arms declare ``text/html; charset=…`` (r11)."""
    import zlib

    base = b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
    if arm == 0:
        return base + b"\r\n" + body
    if arm == 1:
        cut = max(1, len(body) // 2)
        rest = (  # a 0-size chunk TERMINATES the stream — never emit one
            (b"%x\r\n" % (len(body) - cut)) + body[cut:] + b"\r\n"
            if cut < len(body) else b""
        )
        return (
            base + b"Transfer-Encoding: chunked\r\n\r\n"
            + (b"%x;ext=v\r\n" % cut) + body[:cut] + b"\r\n" + rest
            + b"0\r\nX-Digest: sha1:none\r\n\r\n"
        )
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    enc = c.compress(body) + c.flush()
    if arm == 2:
        return base + b"Content-Encoding: gzip\r\n\r\n" + enc
    return (
        base + b"Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n\r\n"
        + (b"%x\r\n" % len(enc)) + enc + b"\r\n0\r\n\r\n"
    )


# ---------------------------------------------------------------------------
# WARC intra-file splits (r7 verdict item 3)
# ---------------------------------------------------------------------------


@query(
    "source_warc_split",
    """
    WITH bodysum AS (
      SELECT doc_id, k.k AS k,
             CAST(SUM(CAST(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':wsplit:'
                   || CAST(k.k AS VARCHAR) || ':' || CAST(h.h AS VARCHAR)),
               j.j * 2 + 1, 2)) AS BIGINT)) AS BIGINT) AS bsum
      FROM documents,
           (SELECT unnest(range(4)) AS k) k,
           (VALUES (0), (1)) h(h),
           (SELECT unnest(range(16)) AS j) j
      GROUP BY doc_id, k.k
    )
    SELECT doc_id, CAST(k AS INT) AS rec_idx,
           'https://example.com/doc/' || CAST(doc_id AS VARCHAR) || '/'
             || CAST(k AS VARCHAR) AS target_uri,
           CAST(32 AS BIGINT) AS n_payload,
           bsum AS body_sum,
           TRUE AS multi_split
    FROM bodysum
    """,
)
def q_source_warc_split(spark: SparkSession, sf: str) -> DataFrame:
    # The INTRA-FILE split path for few-huge-files WARC corpora
    # (SCALE.md's "re-shard first" caveat converted into code): each
    # doc synthesizes a 4-record WARC (each record its own gzip
    # member, 32-byte md5 body), warc_split_index scans the member
    # offsets ONCE (target 200 compressed bytes, forcing >1 split per
    # file), and warc_records_ranged parses each (offset, length)
    # slice independently with first_rec seeding rec_idx — so the
    # union over splits must be ROW-IDENTICAL to the whole-file read.
    # The oracle replays rec_idx continuity, URIs, payload lengths,
    # and body byte-sums; multi_split pins that the file really was
    # cut (vacuous-check rule — a single-split run proves nothing).
    # Gzip output bytes vary by zlib version, so the oracle pins the
    # >1-split BOOLEAN, never a byte count.
    import hashlib

    from hadoopxmlextractor_spark.sources import warc as W

    # r14-opt: id-only repartition before the per-doc synthesis chain —
    # the single-row-group local input otherwise runs the whole
    # synth+gzip chain as ONE task (interleaved A/B at sf0.1: 4.23 →
    # 2.40 s min; unlike source_warc_charset, this chain is heavy
    # enough for the fan-out to pay for itself).
    docs = load(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )

    @F.pandas_udf("binary")
    def _warc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                recs = [
                    {
                        "warc_type": "response",
                        "record_id": f"<urn:uuid:{i}-{k}>",
                        "target_uri": f"https://example.com/doc/{i}/{k}",
                        "content_type": "text/plain",
                        "payload": (
                            hashlib.md5(f"{i}:wsplit:{k}:0".encode()).digest()
                            + hashlib.md5(f"{i}:wsplit:{k}:1".encode()).digest()
                        ),
                    }
                    for k in range(4)
                ]
                out.append(W.write_warc(recs, gzip_members=True))
            yield pd.Series(out)

    # r14-opt: the synthesized files feed the split-index scan AND the
    # ranged-read join; persisting them runs the synthesis once (the
    # cache is this query's stand-in for the on-disk WARC corpus a real
    # deployment would read twice — the index scan and the ranged read
    # each cost one pass over the bytes either way).
    # r15 opt (guide §5, VERDICT r14 item 2): the cache holds CORPUS
    # BLOBS — at 100 TB a MEMORY_AND_DISK blob cache would evict every
    # dimension-sized cache in the app. DISK_ONLY keeps the
    # synthesize-once structure (same plan shape) without competing
    # for executor storage memory; the blobs stream from local disk
    # exactly like the on-disk WARC corpus they stand in for.
    from pyspark import StorageLevel

    files = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        _warc("doc_id").alias("content"),
    ).persist(StorageLevel.DISK_ONLY)
    files.count()
    # r14-opt: the split index feeds TWO consumers (the ranged-read
    # join and the n_splits aggregate); unpersisted, each consumer
    # re-ran the whole synthesis + index scan (the baseline plan shows
    # three ArrowEvalPython synthesis nodes and two MapInPandas index
    # scans). The index is a few metadata rows per FILE — persisting it
    # is dimension-sized at any scale and removes one full pass over
    # the corpus bytes.
    idx = (
        W.warc_split_index(files, target_bytes=200)
        .filter(F.col("split_idx") >= 0)
        .persist()
    )
    idx.count()  # eager: AQE would otherwise race the two consumers
    recs = W.warc_records_ranged(idx.join(files, "path"))
    n_splits = idx.groupBy("path").agg(F.count(F.lit(1)).alias("n_splits"))

    @F.pandas_udf("long")
    def _bytesum(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for payloads in it:
            yield pd.Series(
                [None if p is None else int(sum(bytes(p))) for p in payloads],
                dtype="object",
            )

    return (
        recs.join(F.broadcast(n_splits), "path")
        .select(
            F.col("path").cast("bigint").alias("doc_id"),
            "rec_idx",
            "target_uri",
            F.col("content_length").alias("n_payload"),
            _bytesum("payload").alias("body_sum"),
            (F.col("n_splits") > 1).alias("multi_split"),
        )
    )


# ---------------------------------------------------------------------------
# Crawled-audio container metadata (r7 verdict item 4)
# ---------------------------------------------------------------------------

_MD5B = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), "
    "{pos}, 2)) AS BIGINT)"
)


def _b(salt: str, k: int) -> str:
    """SQL for byte k of md5(doc_id:salt) — the synth parameter replay."""
    return _MD5B.format(salt=salt, pos=2 * k + 1)


@query(
    "multimodal_audio_mp3_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('mp3', 0)} AS b0, {_b('mp3', 1)} AS b1,
             {_b('mp3', 2)} AS b2, {_b('mp3', 3)} AS b3, {_b('mp3', 4)} AS b4
      FROM documents
    ), q AS (
      SELECT doc_id, b1, b2, b3, b4,
             CASE b0 % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                  ELSE 32000 END AS sr
      FROM p
    )
    SELECT doc_id AS media_id, 'mp3' AS codec,
           CAST(sr AS INT) AS sample_rate,
           CAST(CASE WHEN b4 % 4 = 3 THEN 1 ELSE 2 END AS INT) AS channels,
           CAST(NULL AS INT) AS sample_bits,
           CAST(3 + b1 % 6 AS BIGINT) AS n_units,
           CAST(([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
                [b2 % 14 + 1] AS INT) AS bitrate_kbps,
           (doc_id % 2 = 1) AS is_vbr,
           CAST((3 + b1 % 6) * 1152000 // sr AS BIGINT) AS duration_ms,
           CAST((CASE WHEN doc_id % 3 = 0 THEN 20 + b3 % 100 ELSE 0 END)
                + (CASE WHEN doc_id % 5 = 0 THEN 128 ELSE 0 END)
                AS BIGINT) AS meta_bytes
    FROM q
    """,
)
def q_multimodal_audio_mp3_meta(spark: SparkSession, sf: str) -> DataFrame:
    # MP3 joins the natively-walked container tier (the audio analogue
    # of the JPEG header-first strategy): an MPEG-1 Layer III frame-
    # header walk — ID3v2 syncsafe skip, bitrate/rate table lookups,
    # the 144000·br/sr+pad frame-length chain that must land every
    # header on a sync word and the last frame exactly at EOF — so
    # n_units pins the whole walk, and the VBR flag pins per-frame
    # header reads (odd docs step the bitrate index each frame). The
    # oracle replays every md5-drawn synth parameter; full sample
    # decode stays the ffmpeg plug-in point.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    return M.audio_container_meta(M.synth_mp3_media(docs))


@query(
    "multimodal_audio_vorbis_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('ogg', 0)} AS b0, {_b('ogg', 1)} AS b1,
             {_b('ogg', 2)} AS b2, {_b('ogg', 3)} AS b3, {_b('ogg', 4)} AS b4
      FROM documents
    ), q AS (
      SELECT doc_id, b0, b2, b3, b4,
             ([8000,16000,22050,44100])[b1 % 4 + 1] AS sr
      FROM p
    )
    SELECT doc_id AS media_id, 'vorbis' AS codec,
           CAST(sr AS INT) AS sample_rate,
           CAST(b0 % 2 + 1 AS INT) AS channels,
           CAST(NULL AS INT) AS sample_bits,
           CAST(2 + b3 % 4 AS BIGINT) AS n_units,
           CAST((b2 % 14 + 1) * 16 AS INT) AS bitrate_kbps,
           (doc_id % 2 = 1) AS is_vbr,
           CAST((1 + b3 % 4) * (256 + b4) * 1000 // sr AS BIGINT)
             AS duration_ms,
           CAST(30 AS BIGINT) AS meta_bytes
    FROM q
    """,
)
def q_multimodal_audio_vorbis_meta(spark: SparkSession, sf: str) -> DataFrame:
    # Ogg Vorbis page walk with LIVE CRC verification: every synth
    # page is stamped with the real Ogg CRC-32 (0x04C11DB7,
    # non-reflected) and the decoder re-computes it over the
    # crc-zeroed page — one flipped byte anywhere refuses the file
    # (unit-tested), so page count, lacing reassembly, granule
    # positions (duration), and the identification-header fields are
    # all on the exact-oracle path. Theora-in-Ogg remains the
    # plug-in point.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    return M.audio_container_meta(M.synth_vorbis_media(docs))


@query(
    "multimodal_audio_flac_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('flac', 0)} AS b0, {_b('flac', 1)} AS b1,
             {_b('flac', 2)} AS b2, {_b('flac', 3)} AS b3,
             {_b('flac', 4)} AS b4, {_b('flac', 5)} AS b5
      FROM documents
    ), q AS (
      SELECT doc_id, b1, b2, b5,
             ([8000,16000,44100,96000])[b0 % 4 + 1] AS sr,
             1000 + b3 * 256 + b4 AS total
      FROM p
    )
    SELECT doc_id AS media_id, 'flac' AS codec,
           CAST(sr AS INT) AS sample_rate,
           CAST(b1 % 8 + 1 AS INT) AS channels,
           CAST(([8,16,24])[b2 % 3 + 1] AS INT) AS sample_bits,
           CAST(total AS BIGINT) AS n_units,
           CAST(NULL AS INT) AS bitrate_kbps,
           FALSE AS is_vbr,
           CAST(total * 1000 // sr AS BIGINT) AS duration_ms,
           CAST(38 + CASE WHEN doc_id % 2 = 0 THEN 8 + b5 % 50
                     ELSE 0 END AS BIGINT) AS meta_bytes
    FROM q
    """,
)
def q_multimodal_audio_flac_meta(spark: SparkSession, sf: str) -> DataFrame:
    # FLAC STREAMINFO bit-unpack (20-bit rate / 3-bit channels / 5-bit
    # bps / 36-bit total samples out of one 64-bit big-endian word)
    # plus the multi-block metadata walk — every 2nd doc carries a
    # PADDING block the walk must traverse by length, pinned by
    # meta_bytes; the trailing fake frame bytes must NOT be read.
    # Lossless-audio corpora route on exactly these fields. is_vbr is
    # meaningless for lossless FLAC — pinned FALSE on both sides (a
    # NULL boolean stringifies as 'None' in Spark vs 'nan' in the
    # DuckDB-pandas path, a canonicalizer hazard, never a semantic).
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    meta = M.audio_container_meta(M.synth_flac_media(docs))
    return meta.withColumn("is_vbr", F.coalesce("is_vbr", F.lit(False)))


# ---------------------------------------------------------------------------
# Skew-adaptive join (r7 verdict item 6)
# ---------------------------------------------------------------------------


@query(
    "join_auto_salt",
    """
    WITH dim AS (
      SELECT DISTINCT user_id AS uid, user_id * 13 % 101 AS attr FROM events
    ),
    zf AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 7 ELSE user_id END AS uid,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    uf AS (
      SELECT user_id AS uid, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT 'zipf' AS regime, z.uid, d.attr,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(z.cents) AS BIGINT) AS sum_cents
    FROM zf z JOIN dim d ON z.uid = d.uid
    GROUP BY z.uid, d.attr
    UNION ALL
    SELECT 'uniform' AS regime, u.uid, d.attr,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(u.cents) AS BIGINT) AS sum_cents
    FROM uf u JOIN dim d ON u.uid = d.uid
    GROUP BY u.uid, d.attr
    """,
)
def q_join_auto_salt(spark: SparkSession, sf: str) -> DataFrame:
    # Skew-ADAPTIVE join, generalized from the per-operator zipf
    # guards: operators.skew.join_auto_salt probes exact top-k key
    # frequencies (one map-side-combined agg + a bounded 20-row
    # collect) and salts ONLY when a key exceeds hot_share of rows.
    # Two regimes through the SAME operator in one query: a planted
    # ~50%-hot key (every even event rerouted to uid 7 — the viral-
    # user shape) and the organic uniform distribution. The oracle is
    # the PLAIN join for both, so the salted hot/cold split must be
    # row-identical to the naive plan; the decision ledger and the
    # salted-only-when-needed plan shape are pinned by unit test.
    from hadoopxmlextractor_spark.operators import skew as K

    ev = load(spark, sf, "events").select("event_id", "user_id", "value")
    cents = F.round(F.col("value") * 100).cast("long").alias("cents")
    dim = (
        ev.select(F.col("user_id").alias("uid"))
        .distinct()
        .withColumn("attr", F.col("uid") * 13 % 101)
    )
    zf = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(7))
        .otherwise(F.col("user_id"))
        .alias("uid"),
        cents,
    )
    uf = ev.select(F.col("user_id").alias("uid"), cents)

    def agg(joined: DataFrame, regime: str) -> DataFrame:
        return joined.groupBy("uid", "attr").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
        ).select(
            F.lit(regime).alias("regime"), "uid", "attr", "n_rows", "sum_cents"
        )

    return agg(K.join_auto_salt(zf, dim, "uid"), "zipf").unionByName(
        agg(K.join_auto_salt(uf, dim, "uid"), "uniform")
    )


# ---------------------------------------------------------------------------
# Scoped near-dup + SimHash LSH observability
# ---------------------------------------------------------------------------


@query("corpus_minhash_semantic_scope", O.minhash_lsh_scoped_oracle())
def q_corpus_minhash_semantic_scope(spark: SparkSession, sf: str) -> DataFrame:
    # MinHash-LSH near-dup SCOPED by (lang, source) — the production
    # dedup shape: you dedup within a language/source partition, never
    # across (a boilerplate page translated into 40 languages is 40
    # documents, not one 40x-quadratic bucket). The scope rides the
    # band-join KEY via minhash_lsh_candidates_scoped, not a
    # post-filter, so cross-scope candidates are never materialized.
    # Planted evidence keeps BOTH branches live (vacuous-check rule):
    # every 50th doc is mirrored at identical text in the same scope
    # (+1e6 — must pair) and in a ':mirror' source (+2e6 — must not
    # pair with the original). Signatures are computed ONCE and copied
    # to the plants; the sigs plan feeds three branches (banding + two
    # verify joins), hence persist + eager count (the AQE race rule).
    from hadoopxmlextractor_spark.operators import dedup as D

    from hadoopxmlextractor_spark.plans.parallelism import ensure_min_parallelism

    docs = ensure_min_parallelism(
        load(spark, sf, "documents").filter(F.col("text").isNotNull())
    )
    sig = D.minhash_signature_udf(num_hashes=64, shingle_n=3, seed=42)
    # r14-opt: persist BELOW the 3-way union, not above it — the
    # baseline cached the unioned frame, so building the cache itself
    # ran the signature UDF once per branch (and the whole signature
    # pass ran as ONE task on the single-row-group local input; the
    # ensure_min_parallelism guard is a no-op on wide inputs). The
    # plants now copy signatures out of the cache, which is also what
    # the docstring always claimed ("computed ONCE and copied").
    sigs0 = sigs0_cache = docs.select(
        F.col("doc_id").alias("doc"), "lang", "source",
        sig("text").alias("signature"),
    ).persist()
    sigs0_cache.count()
    plants = sigs0.filter(F.col("doc") % 50 == 0)
    sigs = (
        sigs0.unionByName(
            plants.select(
                (F.col("doc") + 1_000_000).alias("doc"),
                "lang", "source", "signature",
            )
        )
        .unionByName(
            plants.select(
                (F.col("doc") + 2_000_000).alias("doc"),
                "lang",
                F.concat("source", F.lit(":mirror")).alias("source"),
                "signature",
            )
        )
    )
    # max_bucket=None: the DuckDB oracle enumerates ALL scope-sharing
    # band pairs uncapped, so the certified query must too — a hot
    # bucket at a larger SF would otherwise silently drop pairs the
    # oracle expects (r8 advice). The cap is a separate operator
    # concern, exercised in test_dedup_similarity.
    cands = D.minhash_lsh_candidates_scoped(
        sigs, ["lang", "source"], bands=32, rows_per_band=2, max_bucket=None
    )
    est = D.estimated_jaccard_udf()
    pairs = (
        cands.join(
            sigs.select(F.col("doc").alias("doc_a"), F.col("signature").alias("sa")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc").alias("doc_b"), F.col("signature").alias("sb")),
            "doc_b",
        )
        .withColumn("est_jaccard", est("sa", "sb"))
        .filter(F.col("est_jaccard") >= 0.5)
    )
    return pairs.select("doc_a", "doc_b", "est_jaccard", "lang", "source")


@query("text_simhash_hamming_buckets", O.simhash_bucket_histogram_oracle())
def q_text_simhash_hamming_buckets(spark: SparkSession, sf: str) -> DataFrame:
    # LSH OBSERVABILITY for the SimHash near-dup path: the 8x8-bit
    # pigeonhole chunk buckets that simhash_near_pairs joins on,
    # surfaced as a (chunk_idx, chunk_val) histogram with bucket sizes
    # and the C(n,2) candidate-pair load each bucket would contribute
    # — exactly the table an operator reads before setting max_bucket
    # (the hot-bucket cap). On this corpus's tiny vocabulary the
    # buckets genuinely concentrate (approximation-pressure rule: the
    # histogram shows real collisions, not an empty diagnosis). One
    # pandas-UDF signature pass + one uniform-key exchange.
    from hadoopxmlextractor_spark.operators import dedup as D

    docs = load(spark, sf, "documents")
    sim = D.simhash(docs, "text", "doc_id")
    chunks = sim.select(
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", 8 * k)
                    .bitwiseAND(F.lit(0xFF))
                    .cast("int")
                    for k in range(8)
                ]
            )
        ).alias("chunk_idx", "chunk_val")
    )
    return (
        chunks.groupBy("chunk_idx", "chunk_val")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") >= 2)
        .select(
            "chunk_idx",
            "chunk_val",
            "bucket_size",
            F.expr("bucket_size * (bucket_size - 1) div 2").alias(
                "n_candidate_pairs"
            ),
        )
    )


# ---------------------------------------------------------------------------
# WARC -> WET composition, sliding distinct counts, language confidence
# ---------------------------------------------------------------------------


@query(
    "source_warc_wet_pipeline",
    """
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':wet') AS x
      FROM documents
    )
    SELECT doc_id, CAST(200 AS INT) AS http_status,
           'w' || substring(x, 1, 2) || ' w' || substring(x, 3, 2)
             || ' & w' || substring(x, 5, 2) || ' w' || substring(x, 7, 2)
             || ' w' || substring(x, 9, 2) || ' w' || substring(x, 11, 2)
             || ' <w' || substring(x, 13, 2) || '> w' || substring(x, 15, 2)
             AS extracted,
           CAST(9 AS INT) AS n_tokens
    FROM h
    """,
)
def q_source_warc_wet_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    # The actual WET-generation pipeline END TO END: WARC container
    # walk (alternating gzip-member and plain layouts per doc) ->
    # warc_type filter (a metadata record per file must be dropped) ->
    # HTTP status/body split -> html_text visible-text extraction
    # (script/head subtrees dropped, &amp;/&lt;/&gt; decoded) -> token
    # count. The oracle CONSTRUCTS the expected extraction from the
    # same md5 arithmetic as text_html_extract (salt ':wet'), so a
    # fault in ANY stage — a gzip member boundary, a Content-Length
    # slice, the HTTP header split, an entity decode — flips the hash.
    # One Arrow chain, zero shuffles.
    import hashlib

    from hadoopxmlextractor_spark.operators import text as T
    from hadoopxmlextractor_spark.sources import warc as W

    docs = load(spark, sf, "documents")

    @F.pandas_udf("binary")
    def _warc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                x = hashlib.md5(f"{i}:wet".encode()).hexdigest()

                def hp(j: int) -> str:
                    return x[2 * j - 2 : 2 * j]

                html = (
                    "<html><head><title>skip me</title><script>var x=1;"
                    f"</script></head><body><h1>w{hp(1)}</h1><p>w{hp(2)}"
                    f" &amp; w{hp(3)}</p><div>w{hp(4)}<span>w{hp(5)}"
                    f"</span></div><p>w{hp(6)} &lt;w{hp(7)}&gt; w{hp(8)}"
                    "</p></body></html>"
                )
                # r11 declared-charset arm: cp1252 bytes, header label
                if int(i) % 3 == 0:
                    http = _http_as_captured(
                        html.encode("cp1252"), int(i) % 4,
                        ctype=b"text/html; charset=windows-1252",
                    )
                else:
                    http = _http_as_captured(html.encode(), int(i) % 4)
                recs = [
                    {
                        "warc_type": "response",
                        "record_id": f"<urn:uuid:{i}-r>",
                        "target_uri": f"https://example.com/doc/{i}",
                        "content_type": "application/http; msgtype=response",
                        "payload": http,
                    },
                    {
                        "warc_type": "metadata",
                        "record_id": f"<urn:uuid:{i}-m>",
                        "target_uri": f"https://example.com/doc/{i}",
                        "content_type": "application/warc-fields",
                        "payload": b"fetchTimeMs: 1",
                    },
                ]
                out.append(
                    W.write_warc(recs, gzip_members=(int(i) % 2 == 0))
                )
            yield pd.Series(out)

    files = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        _warc("doc_id").alias("content"),
    )
    recs = W.warc_records(files).filter(F.col("warc_type") == "response")

    @F.pandas_udf("struct<http_status:int, body:string>")
    def _http(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # r11: declared-charset decode — the WET stage's actual rule
        for payloads in it:
            stat, body = [], []
            for p in payloads:
                s, _enc, _how, text = W.decode_http_html(bytes(p))
                stat.append(s)
                body.append(text)
            yield pd.DataFrame({"http_status": stat, "body": body})

    return (
        recs.withColumn("h", _http("payload"))
        .select(
            F.col("path").cast("bigint").alias("doc_id"),
            F.col("h.http_status").alias("http_status"),
            T.html_text(F.col("h.body")).alias("extracted"),
        )
        .withColumn(
            "n_tokens", F.size(T.tokens(F.col("extracted"))).cast("int")
        )
    )


@query(
    "events_count_distinct_sliding",
    """
    WITH e AS (
      SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, user_id FROM events
    ),
    expanded AS (
      SELECT (ms // 3600000) * 3600000 - k.k * 3600000 AS window_start_ms,
             user_id
      FROM e, (SELECT unnest(range(6)) AS k) k
    )
    SELECT window_start_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM expanded GROUP BY window_start_ms
    """,
)
def q_events_count_distinct_sliding(spark: SparkSession, sf: str) -> DataFrame:
    # SLIDING count-distinct: 6-hour windows every hour, exact
    # distinct users per window — the overlap-aware engagement metric
    # a tumbling grid can't express and approx_count_distinct isn't
    # allowed to approximate here. F.window assigns each event to its
    # 6 covering windows; the oracle replays that as 6 shifted
    # tumbling grids. Scale: the 6x expansion happens map-side and the
    # distinct is one (window, user)-keyed exchange + merge —
    # |windows|x|users| bounded, never a self-join.
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "n_events",
            "n_users",
        )
    )


@query(
    "text_language_confidence",
    """
    WITH p AS (
      SELECT doc_id, ' ' || lower(text) || ' ' AS pad
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id,
             (len(pad) - len(replace(pad, ' the ', ''))) // 5
           + (len(pad) - len(replace(pad, ' and ', ''))) // 5
           + (len(pad) - len(replace(pad, ' of ', ''))) // 4 AS en,
             (len(pad) - len(replace(pad, ' der ', ''))) // 5
           + (len(pad) - len(replace(pad, ' und ', ''))) // 5
           + (len(pad) - len(replace(pad, ' die ', ''))) // 5 AS de,
             (len(pad) - len(replace(pad, ' le ', ''))) // 4
           + (len(pad) - len(replace(pad, ' et ', ''))) // 4
           + (len(pad) - len(replace(pad, ' les ', ''))) // 5 AS fr
      FROM p
    )
    SELECT doc_id,
           CASE WHEN en > 0 AND en >= de AND en >= fr THEN 'en'
                WHEN de > 0 AND de >= fr THEN 'de'
                WHEN fr > 0 THEN 'fr'
                ELSE 'unknown' END AS detected_lang,
           CAST(en AS BIGINT) AS en_score,
           CAST(de AS BIGINT) AS de_score,
           CAST(fr AS BIGINT) AS fr_score,
           CAST(GREATEST(en, de, fr)
                - (en + de + fr - GREATEST(en, de, fr) - LEAST(en, de, fr))
                AS BIGINT) AS margin,
           CAST(GREATEST(en, de, fr) * 1000 // (en + de + fr + 1) AS BIGINT)
             AS conf_pm
    FROM s
    """,
)
def q_text_language_confidence(spark: SparkSession, sf: str) -> DataFrame:
    # Language-ID with a CONFIDENCE report — the admission-pipeline
    # form: per-language integer marker scores (language_id's
    # internals via language_marker_scores), the argmax label, the
    # best-minus-second margin, and a per-mille confidence from
    # integer division (best*1000 div (total+1)) — all integer
    # arithmetic end to end, so Spark `div` and DuckDB `//` agree
    # exactly (the count-rank boundary rule). A router drops or
    # reroutes docs whose margin/confidence is low instead of
    # trusting the bare argmax.
    from hadoopxmlextractor_spark.operators import text as T

    docs = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    scores = T.language_marker_scores(F.col("text"))
    en, de, fr = scores["en"], scores["de"], scores["fr"]
    best = F.greatest(en, de, fr)
    least = F.least(en, de, fr)
    sel = docs.select(
        "doc_id",
        T.language_id("text").alias("detected_lang"),
        en.alias("en_score"),
        de.alias("de_score"),
        fr.alias("fr_score"),
        (en + de + fr).alias("_total"),
        best.alias("_best"),
        least.alias("_least"),
    )
    return sel.select(
        "doc_id",
        "detected_lang",
        "en_score",
        "de_score",
        "fr_score",
        (F.col("_best") - (F.col("_total") - F.col("_best") - F.col("_least")))
        .cast("long")
        .alias("margin"),
        F.expr("_best * 1000 div (_total + 1)").cast("long").alias("conf_pm"),
    )


@query("multimodal_video_rle_shots", O.rle_shots_oracle())
def q_multimodal_video_rle_shots(spark: SparkSession, sf: str) -> DataFrame:
    # The first INTER-FRAME codec decoded natively (closing the top of
    # the r7 "what's missing" codec list with zero new dependencies):
    # Microsoft RLE8 AVI (biCompression=1) — a real temporal-
    # prediction format where delta frames paint only changed runs and
    # everything the EOL/DELTA/EOB escapes skip over is carried from
    # the PREVIOUS frame's canvas. The synth makes every non-key frame
    # a genuine delta (two changed rows per frame inside a scene,
    # full-skip identity frames, full repaints at cuts), and because
    # the codec is lossless the shot-boundary output is hash-exact
    # against the md5 plane replay — a fault in run decode, cursor
    # moves, canvas carry-over, or the bottom-up flip flips the hash.
    # Motion-COMPENSATED codecs (H.264-class) remain the ffmpeg
    # plug-in point.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    media = M.synth_rle_video(docs)
    return M.video_shot_boundaries(media)


@query("multimodal_png_lowbit_ahash", O.image_ahash_lowbit_oracle())
def q_multimodal_png_lowbit_ahash(spark: SparkSession, sf: str) -> DataFrame:
    # SUB-8-BIT PNG decoded natively (the last PNG plug-in residue —
    # the depth/color matrix is now complete): 1/2/4-bit grayscale
    # with byte-unit filtering, MSB-first packed samples, Adam7 on
    # every 5th doc, and the spec's v*(255/(2^d-1)) presentation. The
    # oracle is pure quantization arithmetic over the md5 plane (gray
    # collapses the luminance formula), so one wrong bit anywhere in
    # the packed-geometry path flips the hash.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    media = M.synth_png_lowbit_media(docs)
    return M.image_ahash(media)


@query("multimodal_jpeg_lossless_ahash", O.image_ahash_gray_oracle(salt=":jls"))
def q_multimodal_jpeg_lossless_ahash(spark: SparkSession, sf: str) -> DataFrame:
    # LOSSLESS JPEG (SOF3, T.81 Annex H) decoded natively — another
    # named residue off the JPEG plug-in list (arithmetic and
    # hierarchical remain): per-sample Huffman SSSS + appended-bit
    # diffs, all SEVEN predictor selectors (rotating by doc),
    # Annex-H edge rules, mod-2^16 reconstruction, and 12-BIT
    # precision on odd docs (the first 12-bit JPEG leg) whose
    # high-byte presentation collapses to the same md5 byte as the
    # 8-bit docs — so one pure-arithmetic oracle pins both precisions
    # while the full-width prediction chain (where one wrong neighbor
    # corrupts every later sample) stays on the hash path.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    media = M.synth_jpeg_lossless_media(docs)
    return M.image_ahash(media)


@query(
    "multimodal_audio_opus_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('opus', 0)} AS b0, {_b('opus', 1)} AS b1,
             {_b('opus', 2)} AS b2, {_b('opus', 3)} AS b3,
             {_b('opus', 4)} AS b4
      FROM documents
    )
    SELECT doc_id AS media_id, 'opus' AS codec,
           CAST(([8000,16000,24000,48000])[b2 % 4 + 1] AS INT)
             AS sample_rate,
           CAST(b0 % 2 + 1 AS INT) AS channels,
           CAST(NULL AS INT) AS sample_bits,
           CAST(2 + b3 % 4 AS BIGINT) AS n_units,
           CAST(NULL AS INT) AS bitrate_kbps,
           FALSE AS is_vbr,
           CAST((1 + b3 % 4) * (960 * (1 + b4 % 3)) * 1000 // 48000
                AS BIGINT) AS duration_ms,
           CAST(19 AS BIGINT) AS meta_bytes
    FROM p
    """,
)
def q_multimodal_audio_opus_meta(spark: SparkSession, sf: str) -> DataFrame:
    # Opus-in-Ogg (RFC 7845) joins the audio metadata tier — the
    # modern speech/VoIP codec Common Crawl's audio tail actually
    # carries: OpusHead parse (channels, pre-skip, the recorded input
    # rate) over the SAME live-CRC Ogg page walk as Vorbis, with the
    # RFC's pre-skip-corrected 48 kHz-granule duration rule — the
    # synth steps granules past the pre-skip so the subtraction is on
    # the hash path. Only Theora (video-in-Ogg) remains refused.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    return M.audio_container_meta(M.synth_opus_media(docs))


# ---------------------------------------------------------------------------
# Crawl admission + frontier: robots.txt and sitemap.xml
# ---------------------------------------------------------------------------

_ROBOTS_TXT = """
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp/
Allow: /tmp/page1
Disallow: /*.php$
Allow: /api/
Disallow: /api/page9.json
"""


@query(
    "text_robots_admission",
    f"""
    WITH b AS (
      SELECT doc_id, {_b('rob', 0)} AS b0, {_b('rob', 1)} AS b1,
             {_b('rob', 2)} AS b2
      FROM documents
    ),
    urls AS (
      SELECT doc_id,
             '/' || (['public','private','tmp','media','api','docs'])[b0 % 6 + 1]
             || '/page' || CAST(b1 % 10 AS VARCHAR)
             || (['.html','.php','.json'])[b2 % 3 + 1] AS path
      FROM b
    ),
    rules(allow, rx, prio) AS (VALUES
      (FALSE, '^/private/', 9),
      (FALSE, '^/tmp/', 5),
      (TRUE,  '^/tmp/page1', 10),
      (FALSE, '^/.*\\.php$', 7),
      (TRUE,  '^/api/', 5),
      (FALSE, '^/api/page9\\.json', 15)
    ),
    m AS (
      SELECT u.doc_id, r.allow, r.prio
      FROM urls u JOIN rules r ON regexp_matches(u.path, r.rx)
    ),
    best AS (SELECT doc_id, MAX(prio) AS p FROM m GROUP BY doc_id),
    dec AS (
      SELECT m.doc_id, bool_or(m.allow) AS allowed
      FROM m JOIN best ON m.doc_id = best.doc_id AND m.prio = best.p
      GROUP BY m.doc_id
    )
    SELECT u.doc_id, u.path, COALESCE(d.allowed, TRUE) AS allowed
    FROM urls u LEFT JOIN dec d ON u.doc_id = d.doc_id
    """,
)
def q_text_robots_admission(spark: SparkSession, sf: str) -> DataFrame:
    # Crawl-compliance admission (RFC 9309): the robots.txt engine —
    # group selection (a decoy 'badbot' deny-all group must be
    # ignored), '*'/'$' pattern wildcards, and the longest-match
    # precedence with allow-wins-ties — evaluated as a map-side
    # pandas-UDF filter over md5-derived paths that hit EVERY
    # precedence interaction (an Allow overriding a broader Disallow,
    # a $-anchored extension rule outranking a shorter Allow, an exact
    # path outranking everything, and unmatched paths defaulting to
    # allowed). The oracle re-derives the decisions INDEPENDENTLY:
    # a rules table with the translated regexes + MAX(prio) +
    # bool_or-at-max — never a copy of the engine's answers.
    from hadoopxmlextractor_spark.operators import text as T

    docs = load(spark, sf, "documents")

    def b(k: int):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":rob"))),
                2 * k + 1, 2,
            ), 16, 10,
        ).cast("long")

    seg = F.element_at(
        F.array(*[F.lit(s) for s in
                  ("public", "private", "tmp", "media", "api", "docs")]),
        (b(0) % 6 + 1).cast("int"),
    )
    ext = F.element_at(
        F.array(F.lit(".html"), F.lit(".php"), F.lit(".json")),
        (b(2) % 3 + 1).cast("int"),
    )
    path = F.concat(
        F.lit("/"), seg, F.lit("/page"), (b(1) % 10).cast("string"), ext
    )
    admit = T.robots_admit_udf(_ROBOTS_TXT, agent="mybot")
    return docs.select("doc_id", path.alias("path")).withColumn(
        "allowed", admit("path")
    )


@query(
    "source_sitemap_urls",
    """
    WITH e AS (
      SELECT doc_id, j.j AS entry_idx,
             CAST(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':sm' || CAST(j.j AS VARCHAR)),
               1, 2)) AS BIGINT) AS bj
      FROM documents, (SELECT unnest(range(3)) AS j) j
      WHERE doc_id % 4 <> 0 OR j.j < 2
    )
    SELECT doc_id, CAST(entry_idx AS INT) AS entry_idx,
           CASE WHEN doc_id % 4 = 0 THEN 'index' ELSE 'url' END AS kind,
           CASE WHEN doc_id % 4 = 0
                THEN 'https://example.com/sm/' || CAST(doc_id AS VARCHAR)
                     || '/' || CAST(entry_idx AS VARCHAR) || '.xml'
                ELSE 'https://example.com/doc/' || CAST(doc_id AS VARCHAR)
                     || '/' || CAST(entry_idx AS VARCHAR) END AS loc,
           CASE WHEN doc_id % 4 = 0
                THEN make_date(2026, 2, CAST(1 + bj % 28 AS INT))
                ELSE make_date(2026, 1, CAST(1 + bj % 28 AS INT)) END
             AS lastmod,
           CASE WHEN doc_id % 4 = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST('0.' || CAST(bj % 10 AS VARCHAR) AS DOUBLE) END
             AS priority
    FROM e
    """,
)
def q_source_sitemap_urls(spark: SparkSession, sf: str) -> DataFrame:
    # Sitemap XML → crawl frontier (the engine's XML heritage applied
    # to the fetch pipeline): every 4th doc is a SITEMAPINDEX (2 child
    # sitemaps), the rest urlsets (3 urls with lastmod + priority),
    # all under the real sitemaps.org default namespace so localname
    # matching is on the hash path. The oracle replays loc/lastmod/
    # priority construction; priority goes through the identical
    # string→double parse on both engines.
    import hashlib

    from hadoopxmlextractor_spark.sources.sitemap import sitemap_entries

    docs = load(spark, sf, "documents")
    NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

    @F.pandas_udf("string")
    def _xml(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                def bj(j: int) -> int:
                    return hashlib.md5(f"{i}:sm{j}".encode()).digest()[0]

                if int(i) % 4 == 0:
                    items = "".join(
                        f"<sitemap><loc>https://example.com/sm/{i}/{j}.xml"
                        f"</loc><lastmod>2026-02-{1 + bj(j) % 28:02d}"
                        f"</lastmod></sitemap>"
                        for j in range(2)
                    )
                    out.append(
                        f'<sitemapindex xmlns="{NS}">{items}</sitemapindex>'
                    )
                else:
                    items = "".join(
                        f"<url><loc>https://example.com/doc/{i}/{j}</loc>"
                        f"<lastmod>2026-01-{1 + bj(j) % 28:02d}</lastmod>"
                        f"<priority>0.{bj(j) % 10}</priority></url>"
                        for j in range(3)
                    )
                    out.append(f'<urlset xmlns="{NS}">{items}</urlset>')
            yield pd.Series(out)

    entries = sitemap_entries(
        docs.select("doc_id", _xml("doc_id").alias("xml"))
    )
    return entries.select(
        "doc_id", "entry_idx", "kind", "loc",
        F.to_date("lastmod").alias("lastmod"), "priority",
    )


# ---------------------------------------------------------------------------
# Post-cap additions (NOT in FRONT — the driver sample is full this
# round; these certify next rotation, and run in the local full gate)
# ---------------------------------------------------------------------------


def _surprisal_oracle_sql() -> str:
    # Composition over the registered text_bigram_surprisal oracle —
    # import side-effect guarantees registration when this module is
    # loaded standalone.
    import hadoopxmlextractor_spark.pipeline_queries  # noqa: F401

    from hadoopxmlextractor_spark.queries import ORACLE

    return ORACLE["text_bigram_surprisal"]


@query(
    "corpus_ccnet_buckets",
    f"""
    WITH base AS ({{}}),
    j AS (
      SELECT b.doc_id, d.lang, b.avg_surprisal
      FROM base b JOIN documents d USING (doc_id)
    ),
    r AS (
      SELECT doc_id, lang, avg_surprisal,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY avg_surprisal, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM j
    )
    SELECT doc_id, lang, avg_surprisal,
           (['head','middle','tail'])[CAST(3 * (rn - 1) // n AS INT) + 1]
             AS bucket
    FROM r
    """.format("{SURPRISAL}"),
)
def q_corpus_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    # CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    # language, rank documents by language-model surprisal and split
    # into head/middle/tail terciles — the standard quality
    # stratification a web-corpus pipeline trains on (head) or
    # downsamples (tail). Composes the hash-exact portable_ln bigram
    # LM (text_bigram_surprisal) with count-rank tercile boundaries
    # (3·(rn−1) div n — the integer-division pattern both engines
    # floor identically on non-negative operands); ties break on
    # doc_id so the rank is total. One per-lang exchange over
    # doc-level rows (the corpus is already reduced to one row per
    # doc before the window).
    from pyspark.sql import Window

    from hadoopxmlextractor_spark.queries import QUERIES

    base = QUERIES["text_bigram_surprisal"](spark, sf)
    docs = load(spark, sf, "documents").select("doc_id", "lang")
    j = base.join(docs, "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_surprisal", "doc_id")
    wn = Window.partitionBy("lang")
    r = j.select(
        "doc_id", "lang", "avg_surprisal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bucket = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
        (F.expr("(3 * (rn - 1)) div n") + 1).cast("int"),
    )
    return r.select("doc_id", "lang", "avg_surprisal", bucket.alias("bucket"))


# late-bind the composed oracle (the surprisal SQL is registered by
# pipeline_queries at import time; splice it into the template now)
from hadoopxmlextractor_spark.queries import ORACLE as _ORACLE  # noqa: E402

_ORACLE["corpus_ccnet_buckets"] = _ORACLE["corpus_ccnet_buckets"].replace(
    "{SURPRISAL}", _surprisal_oracle_sql()
)


@query(
    "text_mojibake_repair",
    """
    WITH b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':moji'), 1, 2)) AS BIGINT) AS b0
      FROM documents
    )
    SELECT doc_id,
           CASE doc_id % 4
                WHEN 0 THEN
                  (['café','naïve','über','don’t','São Paulo'])[b0 % 5 + 1]
                WHEN 2 THEN
                  (['don’t stop','em—dash','“quoted”'])[b0 % 3 + 1]
                WHEN 3 THEN
                  (['東京都渋谷区','こんにちは世界'])[b0 % 2 + 1]
                ELSE 'plain' END
             || ' doc ' || CAST(doc_id AS VARCHAR) AS fixed,
           (doc_id % 4 <> 1) AS was_fixed,
           CASE doc_id % 4 WHEN 0 THEN 'cp1252' WHEN 2 THEN 'latin-1'
                WHEN 3 THEN 'shift_jis' ELSE NULL END AS encoding
    FROM b
    """,
)
def q_text_mojibake_repair(spark: SparkSession, sf: str) -> DataFrame:
    # Encoding repair (the ftfy core case) as a corpus-cleaning stage,
    # now across all three common mis-decodes (r8 verdict item 6):
    # doc_id%4==0 plants cp1252 mojibake ('é' shipped as 'Ã©'), %4==2
    # plants latin-1 mojibake (curly quotes shipped as â + C1 control
    # chars — bytes cp1252 CANNOT encode, so the precedence order is
    # live, not decorative), %4==3 plants shift_jis mojibake (CJK
    # UTF-8 read as katakana soup), %4==1 is clean ASCII the repair
    # must not touch — every branch live per the vacuous-check rule.
    # The strict encode(enc)→decode('utf-8') roundtrip must repair
    # each EXACTLY and report WHICH encoding repaired it; the oracle
    # reconstructs the expected REPAIRED strings (real Unicode
    # literals) and encoding labels, never the engine's answers.
    # Map-side, no shuffle.
    import hashlib

    from hadoopxmlextractor_spark.operators import text as T

    docs = load(spark, sf, "documents")
    plants = {
        0: (["café", "naïve", "über", "don’t", "São Paulo"], "cp1252"),
        2: (["don’t stop", "em—dash", "“quoted”"], "latin-1"),
        3: (["東京都渋谷区", "こんにちは世界"], "shift_jis"),
    }

    @F.pandas_udf("string")
    def _input(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                branch = int(i) % 4
                if branch == 1:
                    out.append(f"plain doc {i}")
                    continue
                phrases, enc = plants[branch]
                b0 = hashlib.md5(f"{i}:moji".encode()).digest()[0]
                phrase = phrases[b0 % len(phrases)]
                moji = phrase.encode("utf-8").decode(enc)
                out.append(f"{moji} doc {i}")
            yield pd.Series(out)

    fix = T.fix_mojibake_udf()
    return (
        docs.select("doc_id", _input("doc_id").alias("raw"))
        .withColumn("f", fix("raw"))
        .select(
            "doc_id",
            F.col("f.fixed").alias("fixed"),
            F.col("f.was_fixed").alias("was_fixed"),
            F.col("f.encoding").alias("encoding"),
        )
    )


@query(
    "multimodal_audio_wav_meta",
    """
    SELECT doc_id AS media_id, 'pcm' AS codec,
           CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
           CAST(16 AS INT) AS sample_bits, CAST(256 AS BIGINT) AS n_units,
           CAST(128 AS INT) AS bitrate_kbps, FALSE AS is_vbr,
           CAST(32 AS BIGINT) AS duration_ms, CAST(16 AS BIGINT) AS meta_bytes
    FROM documents
    UNION ALL
    SELECT doc_id + 1000000,
           CASE WHEN doc_id % 2 = 0 THEN 'g711u' ELSE 'g711a' END,
           CAST(8000 AS INT), CAST(1 AS INT), CAST(8 AS INT),
           CAST(256 AS BIGINT), CAST(64 AS INT), FALSE,
           CAST(32 AS BIGINT), CAST(18 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT doc_id + 2000000, 'adpcm',
           CAST(8000 AS INT), CAST(1 AS INT), CAST(4 AS INT),
           CAST(257 AS BIGINT), CAST(32 AS INT), FALSE,
           CAST(32 AS BIGINT), CAST(20 AS BIGINT)
    FROM documents
    """,
)
def q_multimodal_audio_wav_meta(spark: SparkSession, sf: str) -> DataFrame:
    # The WAV legs (PCM / G.711 mu+A-law / IMA ADPCM) surfaced through
    # the SAME audio_container_meta contract as MP3/Vorbis/FLAC/Opus —
    # one metadata operator across the whole audio tier: fmt-chunk
    # code/rate/channels/bits, exact sample counts from data length /
    # block align (ADPCM blocks contribute wSamplesPerBlock each,
    # 2n+1 = 257), byte-rate bitrate, fmt-body meta_bytes (16 PCM /
    # 18 G.711 cbSize / 20 ADPCM extension). The three synths are the
    # ones the ENERGY queries decode sample-exactly, so container and
    # content views of the same bytes are now both certified.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    pcm = M.audio_container_meta(M.synth_wav_media(docs))
    g711 = M.audio_container_meta(M.synth_g711_wav_media(docs)).withColumn(
        "media_id", F.col("media_id") + F.lit(1_000_000)
    )
    adpcm = M.audio_container_meta(
        M.synth_adpcm_wav_media(docs)
    ).withColumn("media_id", F.col("media_id") + F.lit(2_000_000))
    return pcm.unionByName(g711).unionByName(adpcm)


@query(
    "pipeline_crawl_to_corpus",
    """
    WITH c AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS cid
      FROM documents
    ),
    f AS (
      SELECT doc_id, cid,
             md5(CAST(cid AS VARCHAR) || ':c2c') AS x,
             (cid % 7 = 3) AS short,
             (cid % 3 = 0 AND cid % 7 <> 3) AS moji,
             CAST(('0x' || substring(md5(CAST(cid AS VARCHAR) || ':c2cm'),
                                     1, 2)) AS BIGINT) % 4 AS pidx
      FROM c
    ),
    txt AS (
      SELECT doc_id,
             CASE WHEN short
                  THEN 'w' || substring(x, 1, 2) || ' w' || substring(x, 3, 2)
                  ELSE (CASE WHEN moji
                        THEN (['café','naïve','über','don’t'])[pidx + 1] || ' '
                        ELSE '' END)
                    || 'w' || substring(x, 1, 2) || ' w' || substring(x, 3, 2)
                    || ' & w' || substring(x, 5, 2) || ' w' || substring(x, 7, 2)
                    || ' w' || substring(x, 9, 2) || ' w' || substring(x, 11, 2)
                    || ' <w' || substring(x, 13, 2) || '> w' || substring(x, 15, 2)
             END AS extracted,
             CASE WHEN short THEN 2
                  WHEN moji THEN 10 ELSE 9 END AS n_tokens
      FROM f
    ),
    g AS (SELECT doc_id, extracted, n_tokens, md5(extracted) AS fp FROM txt),
    pass AS (SELECT doc_id, fp FROM g WHERE n_tokens >= 5),
    rn AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM pass
    )
    SELECT g.doc_id, g.extracted, CAST(g.n_tokens AS INT) AS n_tokens,
           g.fp AS fingerprint,
           CASE WHEN g.n_tokens < 5 THEN 'short'
                WHEN rn.rn > 1 THEN 'duplicate'
                ELSE 'kept' END AS reason,
           (g.n_tokens >= 5 AND rn.rn = 1) AS kept
    FROM g LEFT JOIN rn ON g.doc_id = rn.doc_id
    """,
)
def q_pipeline_crawl_to_corpus(spark: SparkSession, sf: str) -> DataFrame:
    # The CAPSTONE composition — the actual crawl→corpus admission
    # pipeline end to end through SIX individually-certified stages:
    # WARC container walk → HTTP split → html_text extraction
    # (script/head dropped, &amp; decoded) → mojibake fixpoint repair
    # (every moji doc's page ships a cp1252-double-encoded lead word)
    # → token-count quality gate (cid%7==3 pages carry 2 words —
    # rejected 'short') → exact fingerprint dedup among survivors
    # (cid pairing makes doc 10k+1 byte-identical to doc 10k — the
    # later one rejected 'duplicate', first kept). The oracle replays
    # the CONSTRUCTION arithmetic through the same gate/dedup logic —
    # one wrong byte in ANY stage flips extracted/fingerprint/reason.
    # Scale shape: everything up to the dedup window is map-side; the
    # only shuffle is the fingerprint hash partition.
    import hashlib

    from pyspark.sql import Window

    from hadoopxmlextractor_spark.operators import text as T
    from hadoopxmlextractor_spark.sources import warc as W

    docs = load(spark, sf, "documents")
    phrases = ["café", "naïve", "über", "don’t"]

    @F.pandas_udf("binary")
    def _warc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                cid = int(i) - 1 if int(i) % 10 == 1 else int(i)
                x = hashlib.md5(f"{cid}:c2c".encode()).hexdigest()

                def hp(j: int) -> str:
                    return x[2 * j - 2 : 2 * j]

                if cid % 7 == 3:  # short page
                    body = f"<p>w{hp(1)} w{hp(2)}</p>"
                else:
                    lead = ""
                    if cid % 3 == 0:
                        b0 = hashlib.md5(f"{cid}:c2cm".encode()).digest()[0]
                        phrase = phrases[b0 % 4]
                        lead = (
                            phrase.encode("utf-8").decode("cp1252") + " "
                        )
                    body = (
                        f"<h1>{lead}w{hp(1)}</h1><p>w{hp(2)} &amp; w{hp(3)}"
                        f"</p><div>w{hp(4)}<span>w{hp(5)}</span></div>"
                        f"<p>w{hp(6)} &lt;w{hp(7)}&gt; w{hp(8)}</p>"
                    )
                html = (
                    "<html><head><title>skip</title><script>var x;"
                    f"</script></head><body>{body}</body></html>"
                )
                # r11: a third of the captures ship as DECLARED-cp1252
                # bytes (the iso-8859-1 label real servers use) — the
                # declared-charset decode must recover the identical
                # text, so every downstream oracle stays untouched
                if cid % 3 == 2:
                    http = _http_as_captured(
                        html.encode("cp1252"), int(i) % 4,
                        ctype=b"text/html; charset=iso-8859-1",
                    )
                else:
                    http = _http_as_captured(html.encode(), int(i) % 4)
                out.append(
                    W.write_warc(
                        [
                            {
                                "warc_type": "response",
                                "record_id": f"<urn:c2c:{i}>",
                                "target_uri": f"https://example.com/{i}",
                                "content_type": "application/http; msgtype=response",
                                "payload": http,
                            }
                        ],
                        gzip_members=(int(i) % 2 == 0),
                    )
                )
            yield pd.Series(out)

    files = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        _warc("doc_id").alias("content"),
    )
    recs = W.warc_records(files).filter(F.col("warc_type") == "response")

    @F.pandas_udf("string")
    def _body(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # r11: declared-charset decode (BOM/header/meta resolution),
        # not a blind utf-8 read — a third of the fixture captures are
        # declared-cp1252 bytes that only this path recovers exactly
        for payloads in it:
            yield pd.Series(
                [W.decode_http_html(bytes(p))[3] for p in payloads]
            )

    fix = T.fix_mojibake_udf()
    extracted = (
        recs.select(
            F.col("path").cast("bigint").alias("doc_id"),
            T.html_text(_body("payload")).alias("raw"),
        )
        .withColumn("m", fix("raw"))
        .select(
            "doc_id",
            F.col("m.fixed").alias("extracted"),
        )
        .withColumn("n_tokens", F.size(T.tokens(F.col("extracted"))).cast("int"))
        .withColumn("fingerprint", T.fingerprint(F.col("extracted")))
        # r14-opt (guide §5): extracted feeds the dedup-rank branch AND
        # the final join — unpersisted, the whole synth→walk→decode→
        # repair Python chain ran once per consumer (the
        # pipeline_documents_to_corpus pattern). Text-cardinality
        # cache; eager count per the AQE race rule.
        .persist()
    )
    extracted.count()
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    passing = (
        extracted.filter(F.col("n_tokens") >= 5)
        .select("doc_id", F.row_number().over(w).alias("rn"))
    )
    return (
        extracted.join(passing, "doc_id", "left")
        .select(
            "doc_id", "extracted", "n_tokens", "fingerprint",
            F.when(F.col("n_tokens") < 5, F.lit("short"))
            .when(F.col("rn") > 1, F.lit("duplicate"))
            .otherwise(F.lit("kept"))
            .alias("reason"),
            ((F.col("n_tokens") >= 5) & (F.col("rn") == 1)).alias("kept"),
        )
    )


@query(
    "multimodal_audio_oggflac_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('oflac', 0)} AS b0, {_b('oflac', 1)} AS b1,
             {_b('oflac', 2)} AS b2, {_b('oflac', 5)} AS b5
      FROM documents
    )
    SELECT doc_id AS media_id, 'oggflac' AS codec,
           CAST(([8000,16000,44100,96000])[b0 % 4 + 1] AS INT)
             AS sample_rate,
           CAST(b1 % 8 + 1 AS INT) AS channels,
           CAST(([8,16,24])[b2 % 3 + 1] AS INT) AS sample_bits,
           CAST(3 + b5 % 3 AS BIGINT) AS n_units,
           CAST(NULL AS INT) AS bitrate_kbps,
           FALSE AS is_vbr,
           CAST((1 + b5 % 3) * 4096 * 1000
                // ([8000,16000,44100,96000])[b0 % 4 + 1] AS BIGINT)
             AS duration_ms,
           CAST(51 AS BIGINT) AS meta_bytes
    FROM p
    """,
)
def q_multimodal_audio_oggflac_meta(spark: SparkSession, sf: str) -> DataFrame:
    # FLAC-in-Ogg completes the Ogg dispatch (Vorbis + Opus + FLAC;
    # only Theora — video — remains refused): the mapping header
    # (0x7F 'FLAC' v1.0 + header-packet count) wraps a VERBATIM native
    # STREAMINFO whose last-metadata flag is 0 as real encoders emit
    # (the comment header rides a later page — the parser must NOT
    # walk native blocks past the packet), with duration from the Ogg
    # granule. Same live-CRC page walk; the 13-byte mapping prefix +
    # 4 + 34 = 51 meta bytes pin the framing.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")
    return M.audio_container_meta(M.synth_ogg_flac_media(docs))


@query(
    "multimodal_video_meta",
    f"""
    SELECT doc_id AS media_id, 'rawvideo' AS codec,
           CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           CAST(25 AS INT) AS fps_num, CAST(1 AS INT) AS fps_den,
           CAST(8 AS BIGINT) AS n_frames, CAST(320 AS BIGINT) AS duration_ms
    FROM documents
    UNION ALL
    SELECT doc_id + 1000000, 'mjpeg', CAST(16 AS INT), CAST(16 AS INT),
           CAST(25 AS INT), CAST(1 AS INT), CAST(8 AS BIGINT),
           CAST(320 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT doc_id + 2000000, 'rle8', CAST(8 AS INT), CAST(8 AS INT),
           CAST(25 AS INT), CAST(1 AS INT), CAST(8 AS BIGINT),
           CAST(320 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT doc_id + 3000000, 'theora',
           CAST(16 * ({_b('theo', 0)} % 20 + 1) AS INT),
           CAST(16 * ({_b('theo', 1)} % 12 + 1) AS INT),
           CAST({_b('theo', 2)} % 30 + 1 AS INT), CAST(1 AS INT),
           CAST(1 + {_b('theo', 3)} % 4 AS BIGINT),
           CAST((1 + {_b('theo', 3)} % 4) * 1000
                // ({_b('theo', 2)} % 30 + 1) AS BIGINT)
    FROM documents
    """,
)
def q_multimodal_video_meta(spark: SparkSession, sf: str) -> DataFrame:
    # The VIDEO metadata tier (twin of audio_container_meta): AVI
    # stream-header walk — dims, dwRate/dwScale fps, movi chunk count
    # — across all three natively-decoded codecs (raw DIB / MJPEG /
    # RLE8), plus Theora-in-Ogg, the video Ogg mapping: 42-byte id
    # header (picture dims, 32-bit fps fraction) and the
    # keyframe<<KFGSHIFT|delta granule split that turns the last
    # granule into a frame count (KFGSHIFT rotates 0-3 by doc so the
    # split is live). Metadata routing works even for codecs whose
    # DECODE is the plug-in point — exactly how a corpus routes video
    # it cannot yet decode.
    from hadoopxmlextractor_spark.operators import multimodal as M

    docs = load(spark, sf, "documents")

    def shift(df: DataFrame, k: int) -> DataFrame:
        return df.withColumn("media_id", F.col("media_id") + F.lit(k))

    raw = M.video_container_meta(M.synth_avi_video(docs))
    mj = shift(M.video_container_meta(M.synth_mjpeg_video(docs)), 1_000_000)
    rle = shift(M.video_container_meta(M.synth_rle_video(docs)), 2_000_000)
    th = shift(M.video_container_meta(M.synth_theora_media(docs)), 3_000_000)
    return raw.unionByName(mj).unionByName(rle).unionByName(th)


@query(
    "source_warc_revisit",
    """
    SELECT doc_id,
           'https://example.com/r/' || CAST(doc_id AS VARCHAR)
             AS revisit_uri,
           'md5:' || md5(CAST(doc_id AS VARCHAR) || ':rvdig')
             AS payload_digest,
           '<urn:rv:' || CAST(doc_id AS VARCHAR) || ':a>'
             AS resolved_record_id,
           'https://example.com/a/' || CAST(doc_id AS VARCHAR)
             AS resolved_uri,
           CAST(5 + len(CAST(doc_id AS VARCHAR)) AS BIGINT) AS saved_bytes
    FROM documents
    """,
)
def q_source_warc_revisit(spark: SparkSession, sf: str) -> DataFrame:
    # Common Crawl's crawl-time dedup resolved: each doc's WARC holds
    # an original response (capture A), an unrelated response (capture
    # B, different digest — must NOT be picked up), and a REVISIT
    # record asserting A's payload digest; resolve_revisits joins
    # revisits to responses on the digest and recovers the referenced
    # capture plus the bytes the crawler saved by not re-storing the
    # body. The oracle replays URIs, the digest string, the resolved
    # record id, and the saved byte count; a wrong join key, a B-row
    # leak, or a header-parse fault flips the hash.
    import hashlib

    from hadoopxmlextractor_spark.sources import warc as W

    docs = load(spark, sf, "documents")

    @F.pandas_udf("binary")
    def _warc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                dig = "md5:" + hashlib.md5(f"{i}:rvdig".encode()).hexdigest()
                body = f"body-{i}".encode()
                recs = [
                    {
                        "warc_type": "response",
                        "record_id": f"<urn:rv:{i}:a>",
                        "target_uri": f"https://example.com/a/{i}",
                        "content_type": "text/plain",
                        "payload": body,
                        "payload_digest": dig,
                    },
                    {
                        "warc_type": "response",
                        "record_id": f"<urn:rv:{i}:b>",
                        "target_uri": f"https://example.com/b/{i}",
                        "content_type": "text/plain",
                        "payload": b"other",
                        "payload_digest": "md5:"
                        + hashlib.md5(f"{i}:other".encode()).hexdigest(),
                    },
                    {
                        "warc_type": "revisit",
                        "record_id": f"<urn:rv:{i}:r>",
                        "target_uri": f"https://example.com/r/{i}",
                        "content_type": "message/http",
                        "payload": b"",
                        "payload_digest": dig,
                        "refers_to": f"<urn:rv:{i}:a>",
                    },
                ]
                out.append(W.write_warc(recs, gzip_members=True))
            yield pd.Series(out)

    files = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        _warc("doc_id").alias("content"),
    )
    # r14-opt (guide §5): the record walk feeds THREE consumers (the
    # response-digest aggregate, the revisit side, the record_id →
    # doc_id join-back) — unpersisted, the synth + member walk ran once
    # per consumer. Project the metadata columns BEFORE persisting so
    # the cache never holds payload bytes (guide §2.3: shuffle/cache
    # metadata, not payloads).
    recs = W.warc_records(files).select(
        "path", "record_id", "warc_type", "target_uri",
        "payload_digest", "content_length",
    ).persist()
    recs.count()
    resolved = W.resolve_revisits(recs)
    return resolved.join(
        recs.select(
            F.col("record_id").alias("revisit_record_id"),
            F.col("path").cast("bigint").alias("doc_id"),
        ).distinct(),
        "revisit_record_id",
    ).select(
        "doc_id", "revisit_uri", "payload_digest",
        "resolved_record_id", "resolved_uri", "saved_bytes",
    )
