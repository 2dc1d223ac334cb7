"""Corpus-construction operators: stable splits, vocabulary, chunking,
event sequences, and connected-components cluster resolution."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators.corpus import (
    chunk_documents,
    stable_bucket,
    train_val_split,
    user_event_sequences,
    vocabulary,
)
from hadoopxmlextractor_spark.operators.dedup import connected_components


def _py_bucket(key: str, n_buckets: int = 100) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n_buckets


def test_stable_bucket_matches_python_md5(spark):
    df = spark.range(0, 50).select(F.col("id"), stable_bucket("id").alias("b"))
    for row in df.collect():
        assert row["b"] == _py_bucket(str(row["id"]))


def test_train_val_split_deterministic_and_partitioned(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = train_val_split(df, "k", val_pct=10).collect()
    b = train_val_split(df, "k", val_pct=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    splits = {r["split"] for r in a}
    assert splits == {"train", "val"}
    n_val = sum(r["split"] == "val" for r in a)
    # md5 buckets are near-uniform: expect ~100/1000 in val
    assert 50 <= n_val <= 150
    for r in a:
        assert (r["split"] == "val") == (r["bucket"] >= 90)


def test_chunk_documents_covers_and_handles_empty(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 300)), (2, "one two"), (3, "")],
        ["doc_id", "text"],
    )
    rows = chunk_documents(df, "text", "doc_id", chunk_tokens=128).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [(r["tok_start"], r["tok_end"]) for r in d1] == [(0, 128), (128, 256), (256, 300)]
    assert [(r["tok_start"], r["tok_end"]) for r in by_doc[2]] == [(0, 2)]
    # empty document still emits one [0, 0) chunk
    assert [(r["tok_start"], r["tok_end"]) for r in by_doc[3]] == [(0, 0)]


def test_vocabulary_df_cf(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "B c")], ["doc_id", "text"]
    )
    rows = {r["term"]: (r["df"], r["cf"]) for r in vocabulary(df, "text", "doc_id").collect()}
    # 'a': docs {1,2}, 3 occurrences; 'b': docs {1,3} (lower-cased); 'c': docs {2,3}
    assert rows == {"a": (2, 3), "b": (2, 2), "c": (2, 2)}


def test_user_event_sequences_orders_by_ts_then_id(spark):
    df = spark.createDataFrame(
        [
            (3, "2024-01-01 00:00:02", 1, "c"),
            (1, "2024-01-01 00:00:01", 1, "a"),
            (2, "2024-01-01 00:00:01", 1, "b"),  # ts tie → event_id breaks it
            (4, "2024-01-01 00:00:01", 2, "z"),
        ],
        ["event_id", "ts_s", "user_id", "event_type"],
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type")
    rows = {r["user_id"]: (r["sequence"], r["n_events"]) for r in user_event_sequences(df).collect()}
    assert rows == {1: ("a>b>c", 3), 2: ("z", 1)}


def test_connected_components_chain_and_cliques(spark):
    # chain 1-2-3-4 (diameter > 1 exercises iteration), clique {10,11,12},
    # isolated pair {20,21}
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    rows = connected_components(pairs).collect()
    comp = {r["doc_id"]: r["component_id"] for r in rows}
    canon = {r["doc_id"]: r["is_canonical"] for r in rows}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert {d for d, c in canon.items() if c} == {1, 10, 20}
