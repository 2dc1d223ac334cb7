"""Streaming corpus-admission gates.

A continuously-ingesting training-data pipeline decides per document,
at arrival time, whether it enters the corpus. The DSIR gate scores
each arriving document against importance weights FITTED OFFLINE by
``operators.corpus.dsir_importance_weights`` (the two-pass batch fit)
and admits documents whose average token weight clears a threshold —
the streaming half of the fit-then-score split that production DSIR
already has.

Statelessness is the design point: a streaming groupBy(doc) sum would
need watermark state, but every token of a document arrives in ITS OWN
ROW'S text, so the score is a per-row computation. The dim-bounded
weight table (4096 ints) ships inside the task binary via a closure —
the same pattern as the IVF centroids and PQ codebooks — and the
per-batch work is one Arrow-batched pandas UDF. Stream throughput is
therefore flat over time: no state store, no join, no shuffle.

Determinism: bucket = big-endian int of the first 8 md5 hex chars mod
dim (``operators.corpus.stable_bucket``'s arithmetic, replayed here in
Python), weights are bigints, the score is an integer sum. Tokens in
buckets the fit never saw score 0 (the fit corpus has no evidence
about them) — the LEFT-join generalization of the batch scorer, whose
inner join is total only because it scores the corpus it fit on. The
E2E test asserts the stream's admitted rows equal the left-join batch
twin bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java \s is ASCII-only; Python \s on str is Unicode — spell the class out
_JVM_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _jvm_tokens(t: str) -> list[str]:
    """Python replica of operators.text.tokens (F.trim + split(r'\\s+')):
    trim strips SPACES ONLY (0x20, like Spark trim); F.split uses Java
    split with limit -1, which keeps BOTH leading and trailing empty
    tokens — exactly re.split's behavior (JVM-cross-validated in
    tests). The streaming gate must tokenize byte-for-byte like the
    batch scorer or a doc near the admission threshold flips between
    the two paths."""
    trimmed = t.strip(" ")
    if trimmed == "":
        return []
    return _JVM_WS.split(trimmed)


def weights_map(weights: DataFrame) -> dict[int, int]:
    """Collect a fitted ``(bkt, wt)`` weight table into the driver-side
    dict the streaming gate closes over. Bounded: the table is dim-row
    by construction (the batch fit aggregates to ``dim`` buckets), so
    this is a centroid-sized collect, never corpus-sized."""
    return {int(r["bkt"]): int(r["wt"]) for r in weights.collect()}


def dsir_admission_stream(
    docs: DataFrame,
    wmap: dict[int, int],
    *,
    dim: int = 4096,
    min_avg_weight: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit streaming documents whose DSIR average token weight is at
    least ``min_avg_weight``. Returns an append-mode stream of
    ``(doc_id, n_tokens, score, avg_weight)`` for admitted documents
    (documents with no tokens are never admitted — they carry no
    evidence either way).
    """
    items = sorted(wmap.items())

    def _score_factory():
        local = dict(items)

        @F.pandas_udf("struct<n_tokens:long, score:long>")
        def _score(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for texts in it:
                n_out, s_out = [], []
                for t in texts:
                    toks = _jvm_tokens(t) if t is not None else []
                    s = 0
                    for tok in toks:
                        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim
                        s += local.get(b, 0)
                    n_out.append(len(toks))
                    s_out.append(s)
                yield pd.DataFrame({"n_tokens": n_out, "score": s_out})

        return _score

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        _score_factory()(F.col(text_col)).alias("sc"),
    ).select(
        "doc_id",
        F.col("sc.n_tokens").alias("n_tokens"),
        F.col("sc.score").alias("score"),
    )
    return scored.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "score",
        F.expr("score div n_tokens").alias("avg_weight"),
    ).filter(F.col("avg_weight") >= min_avg_weight)
