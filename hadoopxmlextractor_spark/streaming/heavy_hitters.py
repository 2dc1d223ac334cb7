"""Streaming n-gram heavy hitters with custom keyed state.

The continuous twin of ``operators.text.heavy_hitters``: a pipeline
ingesting documents forever wants to know which phrases have become
frequent (emerging boilerplate) WITHOUT re-scanning history. No built-in
streaming aggregation can express "emit an n-gram once, when its
all-time count first crosses the threshold" — a streaming groupBy.count
in update mode re-emits every batch and cannot see the crossing. This
is the ``applyInPandasWithState`` formulation:

- A ``mapInPandas`` pass turns each micro-batch into per-batch partial
  n-gram counts (same lower-cased whitespace tokenization as the batch
  operator, vectorized per Arrow batch — the token stream never leaves
  the task).
- Partials shard by ``xxhash64(ngram) % n_buckets`` — uniform keys, so
  state and compute spread evenly over executors no matter how skewed
  the phrase distribution is.
- Per shard, state is the exact running count per n-gram; a row
  ``(ngram, cnt)`` is emitted exactly once, in the micro-batch where
  the running count first reaches ``min_count`` (append-mode friendly:
  crossings are immutable facts, unlike ever-changing counts).

Scale note: state grows with distinct n-grams per shard. A bounded
deployment caps it with the same Misra-Gries subtraction the batch
operator uses (trading the exact-crossing guarantee for bounded
memory), a min-batch-count floor before state insertion, or a RocksDB
state store; noted rather than imposed, because the exact-crossing
contract is the operator's point.

Batch-mode oracle: ``text_heavy_hitters`` computes the same ≥min_count
set over a static table (the streaming result converges to it as the
stream drains).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hadoopxmlextractor_spark.operators.text import _ngram_counts


def heavy_hitter_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 3,
    n: int = 2,
    n_buckets: int = 16,
) -> DataFrame:
    """Emit ``(ngram, cnt)`` once per n-gram, in the micro-batch where
    its all-time count first reaches ``min_count`` (cnt is the count at
    the crossing). Append-mode streaming DataFrame."""

    def to_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = _ngram_counts(pdf[text_col], n)
            yield pd.DataFrame(
                {"ngram": counts.index.astype(str), "partial": counts.values}
            )

    partials = docs.select(text_col).mapInPandas(
        to_partials, "ngram string, partial long"
    )
    bucketed = partials.withColumn(
        "bucket", F.pmod(F.xxhash64("ngram"), F.lit(n_buckets))
    )

    def _track(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        counts = (
            dict(zip(state.get[0], state.get[1])) if state.exists else {}
        )
        crossed = []
        for pdf in pdfs:
            for ngram, partial in zip(pdf["ngram"], pdf["partial"]):
                old = counts.get(ngram, 0)
                new = old + int(partial)
                counts[ngram] = new
                if old < min_count <= new:
                    crossed.append((ngram, new))
        state.update((list(counts.keys()), [int(v) for v in counts.values()]))
        yield pd.DataFrame(crossed, columns=["ngram", "cnt"])

    return bucketed.groupBy("bucket").applyInPandasWithState(
        _track,
        outputStructType="ngram string, cnt long",
        stateStructType="ngrams array<string>, counts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def countmin_stream(
    docs: DataFrame, *, text_col: str = "text", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Streaming count-min maintenance: because the sketch IS a
    (row, cell) → count aggregation, the streaming twin is a built-in
    streaming groupBy — no custom state operator, and state is BOUNDED
    at depth × width keys forever, regardless of stream volume or
    vocabulary growth (contrast dedup_stream's distinct-growing digest
    set). Update/complete mode; after any batch prefix the cell table
    equals the batch sketch over the same rows bit-for-bit (count is
    associative), asserted in the E2E test. Cross-shard merge stays
    cell-wise addition, so a fleet of per-stream sketches folds into
    one corpus sketch downstream.

    The construction IS the batch operator applied to a streaming
    DataFrame — one definition, so the stream/batch merge property
    can't drift."""
    from hadoopxmlextractor_spark.operators.text import countmin_sketch

    return countmin_sketch(docs, text_col, depth=depth, width=width)
