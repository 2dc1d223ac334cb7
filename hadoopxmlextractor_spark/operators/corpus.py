"""Corpus-construction operators for LLM training-data pipelines:
deterministic splits, vocabulary statistics, context-window chunking,
and per-user event sequences.

All pure DataFrame plans (whole-stage codegen, one shuffle each at
most); determinism comes from md5-derived hashing, never the
partition-order-sensitive builtin ``hash``/``rand``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators.text import tokens


def stable_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): big-endian int of the
    first 8 md5 hex chars, mod n_buckets. Stable across engines,
    sessions, and partitionings — unlike ``F.hash`` (seeded) or
    ``F.rand`` (partition-order sensitive), so a train/val split never
    migrates rows between runs or engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long") % n_buckets


def train_val_split(
    df: DataFrame, key_col: str, *, val_pct: int = 10, n_buckets: int = 100
) -> DataFrame:
    """Add (bucket, split) columns: rows whose stable bucket falls in the
    top ``val_pct`` buckets become 'val'. Pure projection — no shuffle,
    no sampling job; the split is a property of the key, so re-runs and
    incremental loads land every row in the same split (the property
    training pipelines actually need from a holdout)."""
    b = stable_bucket(key_col, n_buckets)
    return df.withColumn("bucket", b).withColumn(
        "split", F.when(F.col("bucket") < n_buckets - val_pct, "train").otherwise("val")
    )


def vocabulary(
    docs: DataFrame, text_col: str, id_col: str, *, min_df: int = 2
) -> DataFrame:
    """(term, df, cf): document frequency and collection frequency of
    lower-cased whitespace terms with df ≥ min_df. Explode → one
    aggregation: partial (map-side) counts shrink the token stream
    before the single shuffle on term; 100 TB-safe because the term key
    space is bounded by vocabulary size, and stop-word skew is absorbed
    by the partial aggregation (hot terms combine locally first)."""
    terms = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    return (
        terms.groupBy("term")
        .agg(
            F.countDistinct("doc").alias("df"),
            F.count(F.lit(1)).alias("cf"),
        )
        .filter(F.col("df") >= min_df)
    )


def chunk_documents(
    docs: DataFrame, text_col: str, id_col: str, *, chunk_tokens: int = 128
) -> DataFrame:
    """Split documents into fixed-token-budget context-window chunks:
    (id, chunk_idx, tok_start, tok_end). Pure per-row arithmetic +
    posexplode — no shuffle; empty documents yield one empty [0, 0)
    chunk so downstream joins never lose a document."""
    c = F.col(text_col)
    n = F.size(tokens(c))
    n_chunks = F.greatest(F.ceil(n / F.lit(float(chunk_tokens))).cast("int"), F.lit(1))
    return (
        docs.select(
            F.col(id_col),
            n.alias("n_tokens"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_v"),
        )
        .select(
            id_col,
            F.col("chunk_idx"),
            (F.col("chunk_idx") * chunk_tokens).alias("tok_start"),
            F.least(
                (F.col("chunk_idx") + 1) * chunk_tokens, F.col("n_tokens")
            ).alias("tok_end"),
        )
    )


def user_event_sequences(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = ">",
) -> DataFrame:
    """(user, sequence, n_events): the user's event types concatenated in
    (ts, id) order — the sequence-construction step for behavioral
    training examples. One shuffle on user; array_sort over the
    collected structs keeps ordering deterministic (ties broken by the
    unique event id). State is O(events per user) — bounded by session
    length in practice; cap upstream for adversarial users."""
    packed = F.struct(
        F.col(ts_col).alias("ts"), F.col(id_col).alias("eid"), F.col(type_col).alias("et")
    )
    seq = F.array_join(
        F.transform(F.array_sort(F.collect_list(packed)), lambda x: x["et"]), sep
    )
    return events.groupBy(F.col(user_col)).agg(
        seq.alias("sequence"), F.count(F.lit(1)).alias("n_events")
    )
