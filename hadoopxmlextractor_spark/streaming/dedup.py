"""Streaming exact deduplication with custom keyed state.

A training-data pipeline ingesting documents continuously needs
first-seen-wins dedup ACROSS micro-batches — something no built-in
streaming aggregation expresses (dropDuplicates keeps state but cannot
emit only the first occurrence with the full row under append mode
composition with downstream ops; and its state is opaque). This is the
``applyInPandasWithState`` formulation:

- Each document is hashed (md5 of the text) and assigned to one of
  ``n_buckets`` state shards by hashing the digest — the shard key is
  uniform by construction, so state and compute spread evenly over
  executors regardless of input skew.
- Per shard, the state is the set of digests seen so far; a batch's
  rows are emitted only if their digest is new (first occurrence within
  the batch wins by ascending id for determinism).

Scale note: state grows with the number of DISTINCT documents. For a
bounded deployment set a state timeout (``GroupStateTimeout``) or
periodically rotate the checkpoint; a RocksDB state store holds the
shard sets out-of-heap. The per-shard layout (array of fixed-width
digests) keeps Arrow transfer linear in shard size.

Batch-mode oracle: ``dedup_exact`` (operators/dedup.py) computes the
same first-seen-wins result over a static table.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """First-seen-wins streaming dedup of ``(id, text)`` documents.

    Returns a streaming DataFrame of the never-before-seen rows
    ``(doc_id, text)`` in append mode.
    """
    hashed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("digest"),
    ).withColumn("bucket", F.pmod(F.xxhash64("digest"), F.lit(n_buckets)))

    def _dedup(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            fresh = pdf[~pdf["digest"].isin(seen)].drop_duplicates("digest")
            seen.update(fresh["digest"])
            yield fresh[["doc_id", "text"]]
        state.update((sorted(seen),))

    return hashed.groupBy("bucket").applyInPandasWithState(
        _dedup,
        outputStructType="doc_id long, text string",
        stateStructType="digests array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_cardinality_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 64,
) -> DataFrame:
    """Streaming per-source distinct-document estimate with BOUNDED
    state: the keyed state is a KMV sketch — the k smallest md5
    digests seen so far — so state per source is k fixed-width strings
    forever, in contrast to :func:`dedup_stream`, whose exact digest
    set grows with every distinct document. This is the streaming form
    of ``operators.dedup.kmv_cardinality``: because the bottom-k of a
    union is the bottom-k of the bottom-k's, folding each micro-batch
    into the sketch is associative, and after any prefix of batches
    the state equals the batch sketch over the same rows — asserted in
    the E2E test, estimate-for-estimate, against the batch twin.

    Emits one append row per (source, batch) with the post-batch
    running estimate: ``(source, n_sketch, distinct_est, saturated)``.
    The estimate arithmetic is the batch twin's, operation for
    operation (48-bit prefix of the k-th digest, ``(k-1)/u_k``), so
    streaming and batch agree bit-for-bit, not approximately.

    STATE-COMPATIBILITY NOTE: the checkpointed sketch changed shape
    from bottom-k to bottom-(k+1) digests (the extra slot is the
    saturation witness). The stored tuple schema still deserializes,
    so a stream resumed from a pre-change checkpoint whose source
    already exceeded k distinct values transiently reports
    ``saturated=false`` (exact count k) until the next new distinct
    digest arrives. Restart such streams from a fresh checkpoint.
    """
    hashed = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("source"), F.md5(F.col(text_col)).alias("digest")
    )

    def _kmv(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sketch = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            sketch.update(d for d in pdf["digest"] if d is not None)
        # keep bottom-(k+1): the extra slot is the saturation witness —
        # exactly-k distinct is provably exact, matching the batch twin
        sketch = sorted(sketch)[: k + 1]
        saturated = len(sketch) > k
        n = min(len(sketch), k)
        if saturated:
            u = int(sketch[k - 1][:12], 16) / 281474976710656.0
            est = (float(k) - 1.0) / u
        else:
            est = float(n)
        state.update((sketch,))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "n_sketch": [n],
                "distinct_est": [est],
                "saturated": [saturated],
            }
        )

    return hashed.groupBy("source").applyInPandasWithState(
        _kmv,
        outputStructType="source string, n_sketch long, distinct_est double, saturated boolean",
        stateStructType="digests array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _band_exprs(bands: int, rows_per_band: int):
    return F.posexplode(
        F.array(
            *[
                F.hash(F.slice("signature", k * rows_per_band + 1, rows_per_band))
                for k in range(bands)
            ]
        )
    ).alias("band", "bucket")


def corpus_minhash_index(
    corpus_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Static band index of the existing corpus for streaming near-dup
    checks: (band, bucket, corpus_doc, signature). Built once batch-side
    (and persisted in a real deployment, bucketed by (band, bucket));
    the stream joins against it statelessly."""
    from hadoopxmlextractor_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(
        corpus_docs, text_col, id_col, num_hashes=num_hashes
    )
    return sigs.select(
        F.col("doc").alias("corpus_doc"),
        F.col("signature").alias("corpus_signature"),
        _band_exprs(bands, num_hashes // bands),
    )


def near_dup_stream(
    stream_docs: DataFrame,
    corpus_index: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Flag arriving documents that are near-dups of the EXISTING
    corpus: per micro-batch, MinHash signatures (same Arrow kernel as
    batch dedup), band-explode, STATELESS stream-static join on
    (band, bucket) against the corpus index, then the vectorized
    estimated-Jaccard verify. Append mode with no watermark or state —
    the static side carries all the memory, so stream throughput is
    flat over time. A pair surfaces once per colliding band (callers
    needing exactly-once per pair dedup in their sink; the test
    distincts on collect). Batch-mode twin: ``dedup_minhash_lsh``."""
    from hadoopxmlextractor_spark.operators.dedup import (
        estimated_jaccard_udf,
        minhash_signatures,
    )

    sigs = minhash_signatures(
        stream_docs, text_col, id_col, num_hashes=num_hashes
    )
    banded = sigs.select(
        F.col("doc").alias("stream_doc"),
        F.col("signature").alias("stream_signature"),
        _band_exprs(bands, num_hashes // bands),
    )
    est = estimated_jaccard_udf()
    return (
        banded.join(corpus_index, ["band", "bucket"])
        .filter(F.col("stream_doc") != F.col("corpus_doc"))
        .withColumn(
            "est_jaccard",
            F.round(est(F.col("stream_signature"), F.col("corpus_signature")), 4),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("stream_doc", "corpus_doc", "est_jaccard")
    )


def paragraph_dedup_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_tokens: int = 20,
    n_buckets: int = 64,
) -> DataFrame:
    """Streaming twin of ``dedup.paragraph_dedup_stats``'s first-wins
    core: as documents arrive, each non-overlapping ``para_tokens``-
    token paragraph is flagged against every paragraph EVER seen
    (cross-batch keyed state on the md5 paragraph hash, sharded into
    ``n_buckets`` uniform state shards like :func:`dedup_stream`).
    Emits one append row per paragraph: ``(doc_id, para_idx, dup)``;
    per-doc rollups (n_paras / dup_frac) are one ordinary aggregation
    over the output. With documents arriving in ascending id order the
    flags equal the batch operator's global (doc_id, para_idx)
    first-wins over all rows landed so far — asserted
    prefix-for-prefix in the E2E test.

    The paragraph segmentation is the SAME materialize-then-explode
    expression as the batch side, so the two paths cannot drift."""
    toks = docs.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    ).filter(F.size("t") > 0)
    paras = toks.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, (size(t)-1) div {para_tokens}), "
            f"i -> array_join(slice(t, i*{para_tokens}+1, {para_tokens}), ' '))"
        ).alias("paras"),
    )
    hashed = (
        # posexplode_OUTER, same reasoning as the batch twin: the
        # non-outer generator's synthesized size/isnotnull filter
        # re-inlines the interpreted transform lambda below the
        # explode; paras is provably non-empty/non-null here.
        paras.select(
            "doc_id", F.posexplode_outer("paras").alias("para_idx", "para")
        )
        .select("doc_id", "para_idx", F.md5("para").alias("h"))
        .withColumn("bucket", F.pmod(F.xxhash64("h"), F.lit(n_buckets)))
    )

    def _flag(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            pdf = pdf.sort_values(["doc_id", "para_idx"])
            dup = pdf["h"].isin(seen) | pdf["h"].duplicated()
            seen.update(pdf["h"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "para_idx": pdf["para_idx"],
                    "dup": dup,
                }
            )
        state.update((sorted(seen),))

    return hashed.groupBy("bucket").applyInPandasWithState(
        _flag,
        outputStructType="doc_id long, para_idx int, dup boolean",
        stateStructType="hashes array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def debounce_stream(
    events: DataFrame,
    *,
    gap_ms: int = 21_600_000,
) -> DataFrame:
    """Streaming duplicate-event suppression — the continuous twin of
    the ``events_debounce`` batch query (same refresh-on-every-event
    "quiet gap" semantics: an event is a duplicate when its (user,
    type) key fired within the trailing ``gap_ms``).

    Input: a streaming frame with ``event_id long, user_id long,
    event_type string, ms long`` (epoch millis). Output (append):
    ``(event_id, user_id, event_type, is_duplicate)``.

    State is ONE long per ACTIVE key — and, unlike :func:`dedup_stream`
    (whose exact digest set grows with distinct content forever), it is
    TTL-EVICTED: the handler arms an event-time timeout at
    ``last_seen + gap_ms`` and removes the key's state when the
    watermark passes it with no new data. Eviction is semantics-
    preserving by construction — a timed-out key's next event
    necessarily arrives more than ``gap_ms`` after the evicted
    timestamp, which the comparison would have admitted anyway — so
    state size tracks the number of keys active in the last ``gap_ms``,
    not the key universe. That is the bounded-state contract a
    notification/billing gate needs to run for months.

    In-batch flags vectorize as a shifted diff (every event refreshes
    the window, so each row compares against its immediate
    predecessor); only the first row of a batch consults the
    cross-batch state.
    """
    with_ts = events.withColumn("ts", F.timestamp_millis(F.col("ms")))
    watermarked = with_ts.withWatermark("ts", "0 seconds")

    def _debounce(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_seen + gap with no new data: every
            # future event for this key is > gap away — drop the state
            state.remove()
            return
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ms", "event_id"])
            prev = pdf["ms"].shift()
            if last is not None and len(pdf):
                prev.iloc[0] = last
            flags = ((pdf["ms"] - prev) <= gap_ms).fillna(False)
            last = int(pdf["ms"].iloc[-1]) if len(pdf) else last
            yield pdf.assign(is_duplicate=flags.astype(bool))[
                ["event_id", "user_id", "event_type", "is_duplicate"]
            ]
        if last is not None:
            state.update((int(last),))
            state.setTimeoutTimestamp(int(last) + gap_ms + 1)

    return watermarked.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce,
        outputStructType=(
            "event_id long, user_id long, event_type string, "
            "is_duplicate boolean"
        ),
        stateStructType="last_ms long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
