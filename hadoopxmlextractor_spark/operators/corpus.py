"""Corpus-construction operators for LLM training-data pipelines:
deterministic splits, vocabulary statistics, context-window chunking,
and per-user event sequences.

All pure DataFrame plans (whole-stage codegen, one shuffle each at
most); determinism comes from md5-derived hashing, never the
partition-order-sensitive builtin ``hash``/``rand``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators.text import token_count, tokens


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
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Split documents into fixed-token-budget context-window chunks:
    (id, chunk_idx, tok_start, tok_end). ``stride`` < ``chunk_tokens``
    produces OVERLAPPING windows (the RAG / long-context convention:
    tokens near a boundary appear in two chunks so no span is ever cut
    without context); the default ``stride = chunk_tokens`` tiles the
    document disjointly. The last window is the one that REACHES the
    end (``n_chunks = ceil(max(n - chunk, 0)/stride) + 1``) — every
    token is covered, with no redundant all-inside-previous tails.
    Pure per-row arithmetic + posexplode — no shuffle; empty documents
    yield one empty [0, 0) chunk so downstream joins never lose a
    document."""
    if stride is None:
        stride = chunk_tokens
    c = F.col(text_col)
    n = F.size(tokens(c))
    n_chunks = (
        F.ceil(
            F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(float(stride))
        ).cast("int")
        + 1
    )
    return (
        docs.select(
            F.col(id_col),
            n.alias("n_tokens"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_v"),
        )
        .select(
            id_col,
            F.col("chunk_idx"),
            (F.col("chunk_idx") * stride).alias("tok_start"),
            F.least(
                F.col("chunk_idx") * stride + chunk_tokens, F.col("n_tokens")
            ).alias("tok_end"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_docs: int,
    top_k: int = 3,
) -> DataFrame:
    """(doc, term, tf, df, tfidf, rank): the top-k characteristic terms
    per document by tf·ln(N/df).

    The token stream is map-side combined and shuffled ONCE into tf =
    (doc, term, count), which is CACHED (with the eager count the AQE
    cache-race rule requires) because it feeds two consumers: the
    term-level df aggregation — skew-free even for stop-word terms
    thanks to partial aggregation, unlike a partitionBy(term) window,
    which would put all rows of a hot term in one task — and the
    scoring join. df is vocabulary-sized and BROADCASTS back; the
    per-doc ranking window re-shuffles only the deduplicated (doc,
    term) table. Without the cache, Catalyst duplicates the corpus
    aggregation lineage into both branches (two full scans+shuffles —
    observed as 4 exchanges vs 3). ``n_docs`` is passed in by the
    caller (a count the pipeline usually already knows). Ranking sorts
    on the ROUNDED score with the term as tie-break, so ordering is
    reproducible across engines despite double arithmetic."""
    from pyspark.sql import Window

    terms = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    tf.count()  # eager: tf feeds both the df aggregation and the join
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc", "term", "tf", "df", "tfidf", "rank")
    )


def quality_filter(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_tokens: int = 40,
    max_tokens: int = 5000,
    min_distinct_ratio: float = 0.35,
    max_mean_token_len: float = 8.0,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style rule-based corpus cleaning: per-document quality
    signals plus a ``keep`` verdict. Signals: token-count bounds,
    repetition (distinct-token ratio — catches boilerplate/spam loops),
    and mean token length (catches OCR garbage / minified blobs).

    Pure projection over one scan — every signal is a JVM expression,
    no shuffle, no UDF; at 100 TB this runs at scan bandwidth. All
    comparisons use the ROUNDED signal values so the verdict is
    reproducible across engines. ``carry`` names extra input columns to
    pass through (e.g. the text itself when the verdict feeds a
    pipeline), keeping filter-then-continue a single scan instead of a
    join-back on id."""
    from hadoopxmlextractor_spark.operators.text import quality_features

    feats = quality_features(text_col)
    lower_toks = tokens(F.lower(F.col(text_col)))
    distinct_ratio = F.round(
        F.size(F.array_distinct(lower_toks))
        / F.greatest(F.size(lower_toks).cast("double"), F.lit(1.0)),
        4,
    )
    n_tokens = feats["n_tokens"]
    mean_tok = feats["mean_token_len"]
    keep = (
        (n_tokens >= min_tokens)
        & (n_tokens <= max_tokens)
        & (distinct_ratio >= min_distinct_ratio)
        & (mean_tok <= max_mean_token_len)
    )
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n_tokens.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        mean_tok.alias("mean_token_len"),
        keep.alias("keep"),
    )


def user_event_sequences(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = ">",
    max_events_per_user: int = 1000,
) -> DataFrame:
    """(user, sequence, n_events): the user's first ``max_events_per_user``
    event types concatenated in (ts, id) order — the
    sequence-construction step for behavioral training examples.
    ``n_events`` stays the user's TOTAL count so truncation is visible.

    The cap is enforced BEFORE aggregation by a rank filter
    (WindowGroupLimit keeps a bounded k-heap per partition), so an
    adversarial hot user bounds the collect_list state at k, not at
    their event count. The window and the groupBy hash-partition on the
    same key, so Catalyst reuses one shuffle for both; array_sort over
    the ≤k collected structs keeps concat order deterministic (ties
    broken by the unique event id)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ranked = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(type_col),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(user_col)).alias("_cnt"),
    ).filter(F.col("_rn") <= max_events_per_user)
    packed = F.struct(
        F.col(ts_col).alias("ts"), F.col(id_col).alias("eid"), F.col(type_col).alias("et")
    )
    seq = F.array_join(
        F.transform(F.array_sort(F.collect_list(packed)), lambda x: x["et"]), sep
    )
    return ranked.groupBy(F.col(user_col)).agg(
        seq.alias("sequence"), F.max("_cnt").alias("n_events")
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    capacity: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic sequence packing: assign each document to a
    fixed-capacity training sequence by its running token offset.

    The classic pre-training step (concatenate documents into
    ``capacity``-token sequences) made distributed-deterministic:
    documents are sharded by :func:`stable_bucket` (so packing
    parallelizes and re-runs place every doc identically), ordered by
    id within the shard, and a sequence index is derived from the
    running token count — ``seq_idx = floor(start_offset / capacity)``.
    Output: (id, shard, start_offset, seq_idx, n_tokens).

    Scale: ONE shuffle (the per-shard window); the running sum is a
    streaming frame, O(1) state per row. A global (unsharded) pack
    would serialize the corpus through one total order — the shard is
    what keeps 100 TB parallel, at the cost of at most one partial
    sequence of waste per shard."""
    from pyspark.sql import Window

    n_tok = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        docs.select(F.col(id_col), F.col(text_col))
        .withColumn("shard", stable_bucket(id_col, n_shards))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            F.col(id_col),
            "shard",
            (F.col("cum") - F.col("n_tokens")).alias("start_offset"),
            F.floor((F.col("cum") - F.col("n_tokens")) / capacity).alias("seq_idx"),
            "n_tokens",
        )
    )


def span_dedup(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span_tokens: int = 3,
) -> DataFrame:
    """C4-style duplicated-span removal: segment each document into
    fixed ``span_tokens``-token spans, drop every span whose exact text
    already occurred earlier in the corpus (first occurrence in
    (doc, position) order wins), and reconstruct the surviving text.

    Returns (id, n_segments, n_kept, text_deduped).

    Scale shape: posexplode the token stream once, re-aggregate spans
    keyed by (doc, span_idx) — doc-bounded groups, uniform keys — then
    one window shuffle keyed by md5(span) (uniform by construction:
    hash of content) for the corpus-wide first-occurrence rank, and a
    final doc-keyed regroup to rebuild text. Three shuffles total, all
    on uniform keys, no self-joins and no corpus-wide sort; the dedup
    state (one rank per distinct span) is the shuffle itself, never a
    driver-side set. The collect_list→array_sort→transform runs inside
    a doc-keyed aggregate (never under a join — the HOF rule in
    SCALE.md applies to join/explode inputs, and each array here is
    span_tokens elements long).
    """
    did = F.col(id_col)
    toks = docs.select(
        did,
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    spans = (
        toks.withColumn("span_idx", (F.col("pos") / span_tokens).cast("bigint"))
        .groupBy(id_col, "span_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("span")
        )
    )
    w = Window.partitionBy(F.md5(F.col("span"))).orderBy(id_col, "span_idx")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") == 1,
                            F.struct("span_idx", "span"),
                        )
                    )
                ),
                lambda s: s.span,
            ),
            " ",
        ).alias("text_deduped"),
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """CCNet-style LM quality scoring (arxiv:1911.00359 §3: documents
    are ranked by LM perplexity), with the LM reduced to the corpus's
    own unigram distribution so the score is exactly recomputable:
    score(doc) = -avg over tokens of ln p(tok), perplexity proxy =
    exp(score). High perplexity = tokens rare in the corpus =
    gibberish/noise candidates; low = boilerplate.

    Returns (id, n_tokens, avg_neg_logprob, perplexity).

    Scale shape: one token explode + groupBy builds the vocabulary
    (bounded by distinct-token count, not corpus size); the corpus
    total is a broadcast scalar; the tokens→probs join broadcasts the
    vocabulary, so the hot stopword keys never shuffle-skew (a shuffle
    join on raw tokens would put every "the" on one reducer). Web-scale
    vocabularies beyond broadcast range would cap with a min-df floor +
    OOV bucket before broadcasting.
    """
    did = F.col(id_col)
    toks = docs.select(
        did, F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("t"))
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (F.col("c") / F.col("t")).alias("p")
    )
    return (
        toks.join(F.broadcast(probs), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(-F.avg(F.log("p")), 6).alias("avg_neg_logprob"),
            F.round(F.exp(-F.avg(F.log("p"))), 6).alias("perplexity"),
        )
    )


def shuffle_shards(
    docs: DataFrame, id_col: str, *, n_shards: int = 8
) -> DataFrame:
    """Deterministic corpus shuffle + sharding for training-shard
    writes: every row gets (shard_id, pos_in_shard) where the shard is
    a stable md5 bucket of the key and the in-shard order is the md5
    hex string itself — a reproducible pseudo-random permutation with
    no seed state, so re-runs, retries, and incremental rebuilds place
    every document identically.

    The scale point is what this does NOT do: assign a global
    contiguous rank. A corpus-wide ``row_number`` needs a single-task
    window (or a driver-side merge) — the classic 100 TB cliff.
    Sharding first bounds every sort to corpus/n_shards rows behind a
    uniform hash key: one shuffle, n_shards-way parallel, and
    (shard_id, pos_in_shard) is exactly what a shard writer needs.
    """
    hh = F.md5(F.col(id_col).cast("string"))
    out = docs.select(
        F.col(id_col),
        stable_bucket(id_col, n_shards).alias("shard_id"),
        hh.alias("_hh"),
    )
    w = Window.partitionBy("shard_id").orderBy("_hh", id_col)
    return out.withColumn(
        "pos_in_shard", (F.row_number().over(w) - 1).cast("bigint")
    ).drop("_hh")


def temperature_rates(
    docs: DataFrame, source_col: str, *, alpha: float = 0.5
) -> DataFrame:
    """(source, n_docs, keep_rate): per-source keep rates for
    temperature-weighted resampling (downsample-only). Target share of
    source s is n_s^alpha / Σ n^alpha (alpha<1 flattens the source
    distribution — the multilingual mixture-rebalancing rule of
    arXiv:1901.07291 §3.1); the rate caps at 1 so under-represented
    sources are never upsampled:

        keep_rate(s) = min(1, (w_s / Σw) * N / n_s),  w_s = n_s^alpha

    Two dimension-sized aggregates (|sources| rows) plus a 1-row
    broadcast for the totals — O(dims) beyond the corpus scan. The
    default alpha=0.5 computes w via sqrt, which is IEEE-correctly-
    rounded on every engine, so a SQL oracle can replay the arithmetic
    digit-for-digit (generic pow is only ulp-reproducible per-libm).
    """
    per = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.sqrt(F.col("n_docs")) if alpha == 0.5 else F.pow(F.col("n_docs"), F.lit(alpha))
    weighted = per.withColumn("w", w)
    tot = weighted.agg(F.sum("n_docs").alias("total"), F.sum("w").alias("w_sum"))
    # Arithmetic shape is part of the contract: ((w / Σw) * N) / n_s
    # with N cast to double — the oracle must group operations
    # identically or last-ulp drift breaks the ROUND.
    rate = F.least(
        F.lit(1.0),
        (F.col("w") / F.col("w_sum")) * F.col("total").cast("double") / F.col("n_docs"),
    )
    return weighted.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.col("n_docs"),
        F.round(rate, 6).alias("keep_rate"),
    )


def temperature_sample(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    *,
    alpha: float = 0.5,
    n_buckets: int = 10_000,
    rates: DataFrame | None = None,
) -> DataFrame:
    """Apply :func:`temperature_rates` as a deterministic per-row
    Bernoulli: keep iff ``stable_bucket(id, n_buckets) <
    floor(keep_rate * n_buckets)`` — a property of the key like
    ``train_val_split``, so re-runs and incremental loads keep exactly
    the same rows (no ``F.rand`` partition-order sensitivity, no seed
    state to coordinate across 1000 executors).

    Scale: keep_rate joins onto the corpus as a BROADCAST of |sources|
    rows; the corpus itself is touched by one scan and zero shuffles.
    Pass a precomputed ``rates`` frame to share it across consumers.

    Returns the kept rows plus (keep_rate, bucket) audit columns.
    """
    if rates is None:
        rates = temperature_rates(docs, source_col, alpha=alpha)
    return (
        docs.join(F.broadcast(rates.select(source_col, "keep_rate")), source_col)
        .withColumn("bucket", stable_bucket(id_col, n_buckets))
        .filter(
            F.col("bucket")
            < F.floor(F.col("keep_rate") * F.lit(float(n_buckets))).cast("long")
        )
    )


def length_buckets(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Sequence-length bucketing for padding-efficient batch packing:
    assign each document to one of ``len(quantiles)+1`` buckets by
    exact token-count quantile boundaries. Grouping similar lengths
    before batching is the standard trick to cut padding waste when
    sequences are batched to the max length in the batch.

    Scale shape: the obvious ``NTILE(k) OVER (ORDER BY n_tokens)`` is
    a GLOBAL sort window — a single-task cliff at corpus scale. Here
    the boundaries come from one exact ``percentile`` aggregate
    (state is O(distinct lengths), which is bounded by the context
    window, not the corpus) and broadcast back as a 1-row frame; the
    bucket assignment is then a pure projection over one scan. With
    dyadic quantiles (quarters) over integer lengths the interpolated
    boundaries are exactly representable doubles, so a SQL oracle
    reproduces them digit-for-digit.
    """
    lens = docs.select(
        F.col(id_col), token_count(F.col(text_col)).cast("long").alias("n_tokens")
    )
    bounds = lens.agg(
        *[
            F.expr(f"percentile(n_tokens, {q!r})").alias(f"q{i}")
            for i, q in enumerate(quantiles)
        ]
    )
    bucket = sum(
        (F.col("n_tokens") > F.col(f"q{i}")).cast("int") for i in range(len(quantiles))
    )
    return lens.crossJoin(F.broadcast(bounds)).select(
        id_col, "n_tokens", bucket.alias("bucket")
    )


def tokenize_ids(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_df: int = 2,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Map documents to (id, pos, token, token_id) rows — the
    text→token-ids bridge that runs between vocabulary construction and
    sequence packing in a training pipeline. Ids are assigned
    deterministically by (df DESC, term) rank over :func:`vocabulary`
    (frequent terms get small ids, ties broken lexically — the ordering
    BPE-style vocabularies use), with id 0 reserved for OOV (terms
    below ``min_df``).

    Scale: the vocabulary is bounded by distinct terms, not corpus
    size, so the id table BROADCASTS to the token stream — a shuffle
    join keyed on raw tokens would send every "the" to one reducer
    (the worst skew key in existence; same rule as
    :func:`unigram_logprob`). The id-assignment window sorts only the
    vocabulary table. posexplode keeps per-document positions without
    any shuffle, so the corpus-sized side moves zero times.

    Pass a precomputed ``vocab`` (term, df, cf) frame to reuse one
    across consumers; otherwise it is built from ``docs``.
    """
    if vocab is None:
        vocab = vocabulary(docs, text_col, id_col, min_df=min_df)
    w = Window.orderBy(F.col("df").desc(), F.col("term"))
    ids = vocab.select("term", F.row_number().over(w).cast("int").alias("token_id"))
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "token"),
    )
    return (
        toks.join(F.broadcast(ids), toks["token"] == ids["term"], "left")
        .select(
            id_col,
            "pos",
            "token",
            F.coalesce(F.col("token_id"), F.lit(0)).cast("int").alias("token_id"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Second-order LM quality scoring: rank documents by the corpus's
    own bigram model, score(doc) = -avg over positions of
    ln P(w_i | w_{i-1}) with P = c(w_{i-1} w_i) / c(w_{i-1} ·). The
    conditional model catches what :func:`unigram_logprob` cannot —
    documents whose tokens are individually common but strung together
    improbably (shuffled/generated text scores high perplexity here
    while passing a unigram filter). No smoothing is needed: every
    scored bigram contributed to the corpus counts by construction.

    Returns (id, n_bigrams, avg_neg_logprob, perplexity); documents
    with fewer than two tokens have no bigrams and drop out.

    Scale shape: ONE doc-keyed shuffle builds the successor pairs
    (posexplode + lead window — ties impossible, pos is unique per
    doc); the pair stream is cached eagerly because it feeds both the
    count tables and the scoring join (AQE cache-race rule). Bigram
    and prefix counts are vocabulary²-bounded and BROADCAST to the
    scoring join — raw-token shuffle joins would skew on stop words.
    Web-scale bigram tables beyond broadcast range would take a
    min-count floor + backoff-to-unigram bucket first (the same cap
    rule as the unigram vocabulary).
    """
    did = F.col(id_col)
    toks = docs.select(
        did, F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        toks.select(
            did,
            F.col("tok").alias("prefix"),
            F.lead("tok").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .withColumn("bg", F.concat_ws(" ", "prefix", "nxt"))
        .persist()
    )
    pairs.count()  # eager: feeds the count tables and the scoring join
    bg_counts = pairs.groupBy("prefix", "bg").agg(F.count(F.lit(1)).alias("c_bg"))
    prefix_counts = pairs.groupBy("prefix").agg(F.count(F.lit(1)).alias("c_prefix"))
    probs = bg_counts.join(F.broadcast(prefix_counts), "prefix").select(
        "bg", (F.col("c_bg") / F.col("c_prefix")).alias("p")
    )
    return (
        pairs.join(F.broadcast(probs), "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(-F.avg(F.log("p")), 6).alias("avg_neg_logprob"),
            F.round(F.exp(-F.avg(F.log("p"))), 6).alias("perplexity"),
        )
    )


def chunk_text(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_tokens: int = 128,
    carry: tuple = (),
) -> DataFrame:
    """:func:`chunk_documents` with the actual chunk text materialized —
    (id, chunk_idx, n_tokens, chunk_text) — the form a pipeline feeds
    to a tokenizer. Same shuffle profile: per-row arithmetic +
    posexplode + an ``F.slice``/``array_join`` projection (plain
    expressions, not interpreted lambda HOFs), zero shuffle at any
    scale; output size is input tokens, linear. Empty documents emit
    one empty chunk so downstream joins never lose a document.
    ``carry`` passes metadata columns through the projection."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(F.ceil(n / F.lit(float(chunk_tokens))).cast("int"), F.lit(1))
    piece = F.slice(
        F.col("_toks"), F.col("chunk_idx") * chunk_tokens + 1, F.lit(chunk_tokens)
    )
    return (
        docs.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            toks.alias("_toks"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_v"),
        )
        .select(
            id_col,
            *carry,
            "chunk_idx",
            F.size(piece).alias("n_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def upsert(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    *,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics over plain DataFrames (copy-on-write):
    batch rows REPLACE matching corpus rows, unmatched batch rows are
    INSERTED, and rows flagged in ``delete_col`` are REMOVED — the
    maintenance operation every continuously-updated training corpus
    needs (takedowns, re-crawls, license revocations).

    Shape: one left-anti join of the corpus against the batch's keys
    (uniform id keys; the batch side broadcasts whenever it is
    batch-sized) plus a union with the batch's surviving rows — the
    same plan a table format's MERGE compiles to for copy-on-write,
    minus the transaction log. At 100 TB the anti join is the only
    corpus-wide work and it rides a broadcast, so a merge costs one
    scan.
    """
    cols = [c for c in corpus.columns]
    keys = batch.select(F.col(id_col))
    kept = corpus.join(F.broadcast(keys), id_col, "left_anti")
    incoming = batch
    if delete_col is not None:
        incoming = incoming.filter(~F.col(delete_col))
    return kept.unionByName(incoming.select(*cols))


def _bpe_train(
    docs: DataFrame, text_col: str, *, rounds: int = 6
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Train BPE tokenizer merges on the corpus (Sennrich et al.
    2016, "Neural Machine Translation of Rare Words with Subword
    Units"): per round, the most frequent adjacent symbol pair across
    the word-frequency table becomes a new merged symbol. Returns the
    merge table — (rank, left_sym, right_sym, merged, pair_count) —
    the artifact a tokenizer ships.

    Semantics pinned for exact replay: pair counts are per adjacent
    POSITION (overlaps included, the reference implementation's
    ``get_stats``), weighted by word frequency; the argmax tie-breaks
    on the pair string ascending; application is greedy left-to-right
    (in "a a a" the first two symbols merge, the third survives) —
    equivalent to repeatedly replacing the LEFTMOST occurrence, which
    is what the oracle's recursive CTE replays.

    Scale: BPE trains on the DISTINCT-WORD table (vocabulary-bounded —
    millions of rows at 100 TB, not the corpus), built with one
    uniform-key shuffle; each round is one pair-explode + groupBy over
    that table, and only the single argmax row ever reaches the driver
    (the inherently sequential step of the algorithm). Word state is
    localCheckpoint'ed per round so the plan stays flat.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    @F.pandas_udf("array<string>")
    def chars(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ws in it:
            yield pd.Series([list(w) for w in ws])

    state = words.select(
        "word", "freq", chars("word").alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, rounds + 1):

        @F.pandas_udf("array<string>")
        def pairs(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for ss in it:
                yield pd.Series(
                    [[f"{s[i]} {s[i+1]}" for i in range(len(s) - 1)] for s in ss]
                )

        best = (
            state.select("freq", F.explode(pairs("syms")).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split(" ", 1)
        merges.append((rank, left, right, left + right, cnt))

        def make_apply(_l: str, _r: str):
            @F.pandas_udf("array<string>")
            def apply_merge(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
                for ss in it:
                    out = []
                    for s in ss:
                        new, i, n = [], 0, len(s)
                        while i < n:
                            if i < n - 1 and s[i] == _l and s[i + 1] == _r:
                                new.append(_l + _r)
                                i += 2
                            else:
                                new.append(s[i])
                                i += 1
                        out.append(new)
                    yield pd.Series(out)

            return apply_merge

        apply_merge = make_apply(left, right)

        state = state.select(
            "word", "freq", apply_merge("syms").alias("syms")
        ).localCheckpoint(eager=True)

    return merges, state


def bpe_learn_merges(
    docs: DataFrame, text_col: str, *, rounds: int = 6
) -> DataFrame:
    """The merge TABLE from :func:`_bpe_train` — (rank, left_sym,
    right_sym, merged, pair_count), the artifact a tokenizer ships."""
    merges, _ = _bpe_train(docs, text_col, rounds=rounds)
    return docs.sparkSession.createDataFrame(
        merges,
        "rank bigint, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def bpe_encoded_words(
    docs: DataFrame, text_col: str, *, rounds: int = 6
) -> DataFrame:
    """The word-frequency table AFTER all learned merges are applied,
    exploded to (word, freq, pos, sym) — the subword segmentation the
    trained tokenizer would emit per vocabulary word (encoding unseen
    text = a broadcast lookup of this table plus the same greedy merge
    loop for OOV words)."""
    _, state = _bpe_train(docs, text_col, rounds=rounds)
    return state.select(
        "word",
        "freq",
        F.posexplode("syms").alias("pos", "sym"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    *,
    dim: int = 4096,
    scale: int = 10000,
) -> DataFrame:
    """DSIR-style data selection via hashed importance weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): fit hashed-unigram distributions over a TARGET
    subset (``target_col`` boolean — e.g. wiki-quality docs) and the
    RAW corpus, then score every document by how target-like its
    tokens are; downstream sampling keeps the highest-weight docs.

    Determinism: DSIR's log-likelihood-ratio sum is float (libm ln
    differs across engines — the no-float-BM25 rule), so the score is
    an integer-exact surrogate: each token contributes its bucket's
    scaled likelihood ratio ``(ct * scale) div cr`` (bigint floor
    division, both operands non-negative), summed per document. The
    per-token ratio is a monotone transform of the same evidence; the
    sum replaces DSIR's log-product, trading the probabilistic
    interpretation for bit-identical replay on any engine.

    Scale: TWO passes over the token stream (fit, then score) — the
    same shape as production DSIR, which fits the n-gram distributions
    before scoring. The fit aggregates to ``dim`` rows (map-side
    partial combine; uniform md5 buckets), the weight table rides a
    BROADCAST join onto the scoring pass, and the doc-keyed sum is the
    only corpus-sized shuffle. No Python anywhere — bucket, ratio, and
    sum are all codegen expressions.

    Returns ``(id, n_tokens, score, avg_weight)`` — one row per doc
    with ≥1 token; ``avg_weight = score div n_tokens`` removes the
    length bias for thresholding.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(target_col).alias("is_t"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).withColumn("bkt", stable_bucket("token", dim))
    stats = toks.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("long").alias("cr"),
        F.sum(F.col("is_t").cast("long")).cast("long").alias("ct"),
    )
    weights = stats.select(
        "bkt", F.expr(f"(ct * {scale}) div cr").alias("wt")
    )
    return (
        toks.join(F.broadcast(weights), "bkt")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("wt").cast("long").alias("score"),
        )
        .select(
            id_col,
            "n_tokens",
            "score",
            F.expr("score div n_tokens").alias("avg_weight"),
        )
    )


def curriculum_stages(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Curriculum ordering for training (easy → hard): stage documents
    by exact difficulty quantiles of the :func:`unigram_logprob`
    perplexity proxy, with a deterministic shuffle WITHIN each stage.
    Training loaders then consume stage 0 shards first, stage k last —
    curriculum learning's data-side half.

    Scale shape, composing two house disciplines: the difficulty score
    becomes an exact integer (rounded micro-nats — ROUND(x,6)·1e6
    rounded again before the BIGINT cast, because Spark CAST truncates
    doubles while DuckDB rounds), stage boundaries come from one exact
    ``percentile`` aggregate over those integers broadcast back
    (dyadic quantiles over integers interpolate to exactly
    representable doubles — the :func:`length_buckets` pattern, never
    a global-sort NTILE), and the within-stage position is an
    md5-keyed rank PARTITIONED BY STAGE (stage-local shuffle — the
    :func:`shuffle_shards` pattern, never a global contiguous rank).
    Returns (id, stage, pos_in_stage, score_micro).
    """
    scored = unigram_logprob(docs, text_col, id_col).select(
        F.col(id_col),
        F.round(F.col("avg_neg_logprob") * 1_000_000)
        .cast("long")
        .alias("score_micro"),
    )
    bounds = scored.agg(
        *[
            F.expr(f"percentile(score_micro, {q!r})").alias(f"q{i}")
            for i, q in enumerate(quantiles)
        ]
    )
    stage = sum(
        (F.col("score_micro") > F.col(f"q{i}")).cast("int")
        for i in range(len(quantiles))
    )
    staged = scored.crossJoin(F.broadcast(bounds)).select(
        id_col, "score_micro", stage.alias("stage")
    )
    w = Window.partitionBy("stage").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return staged.select(
        id_col,
        "stage",
        (F.row_number().over(w) - 1).cast("long").alias("pos_in_stage"),
        "score_micro",
    )


def priority_sample(
    docs: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    k: int,
) -> DataFrame:
    """Weighted sampling without replacement by PRIORITY SAMPLING
    (Duffield, Lund & Thorup, "Priority sampling for estimation of
    arbitrary subset sums", JACM 2007) with EXACT integer priorities -
    the quality-weighted corpus subsample that still supports unbiased
    token-count estimates over the full corpus.

    Each row draws a deterministic uniform u (32-bit md5 prefix of the
    id - reproducible, engine-replayable, no RNG state) and gets the
    integer priority key ``floor(u*2^20 / w)``: ascending key order is
    exactly descending DLT priority w/u, so the k smallest keys are
    the k sampled rows, all in bigint (u*2^20 <= 2^52: no overflow, no
    float ordering anywhere - a float priority would sit one ulp from
    flipping a rank between engines). The (k+1)-th key is the
    threshold tau; every sampled row carries the DLT estimator weight
    ``est = max(w, floor(2^52/(tau_key+1)))`` (the +1 floor-guard
    makes this the documented floor approximation of 1/tau), whose sum
    estimates SUM(w) over the WHOLE corpus - the property uniform
    sampling lacks.

    Scale: the k+1 candidates come from ONE ordered limit
    (TakeOrderedAndProject: per-partition top-(k+1), then a merge of
    (k+1)-row heads - never a global sort); the threshold is an
    aggregate over k+1 rows; the rank window runs on the same tiny
    frame. ``weight_col`` must be a POSITIVE integer (cents, chars,
    tokens - the same integer contract as maintain_minmax_rollup).
    """
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    keyed = docs.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("w"),
        (u * F.lit(1048576)).alias("_scaled"),
    ).select(id_col, "w", F.expr("_scaled div w").alias("pkey"))
    cand = keyed.orderBy(F.col("pkey").asc(), F.col(id_col).asc()).limit(k + 1)
    # tau rides a window over the k+1-row frame instead of a scalar
    # cross join: the plan stays join-free (lint-clean — even a 1-row
    # broadcast cross join is a BroadcastNestedLoopJoin node), and a
    # corpus with <= k rows reports tau_key = -1 with the exact weight
    # as estimator (exhaustive sample, same contract as the grouped
    # variant)
    w_rank = Window.orderBy(F.col("pkey").asc(), F.col(id_col).asc())
    w_all = Window.partitionBy()
    ranked = cand.withColumn("_rn", F.row_number().over(w_rank))
    tau = F.coalesce(
        F.max(F.when(F.col("_rn") == k + 1, F.col("pkey"))).over(w_all),
        F.lit(-1),
    )
    return (
        ranked.withColumn("tau_key", tau)
        .filter(F.col("_rn") <= k)
        .select(
            id_col,
            "w",
            "pkey",
            "tau_key",
            F.when(F.col("tau_key") < 0, F.col("w"))
            .otherwise(
                F.greatest(
                    F.col("w"),
                    F.expr("4503599627370496 div (tau_key + 1)"),
                )
            )
            .cast("long")
            .alias("est"),
        )
    )


# Feistel round constants: arbitrary odd multipliers (Knuth-style),
# one per round - public mixing constants, nothing secret.
_FEISTEL_ROUNDS = (2654435761, 2246822519, 3266489917)
_FEISTEL_BITS = 10  # half-width b: domain M = 2^(2b) = 1,048,576 slots


def epoch_slots(
    docs: DataFrame,
    id_col: str,
    index_col: str,
    *,
    epochs: int = 2,
    seed: int = 0,
) -> DataFrame:
    """SHUFFLE-FREE multi-epoch shuffle: assign every document a
    distinct reading slot per epoch via a 3-round FEISTEL NETWORK over
    the padded domain [0, 2^20) - a bijection computed as pure integer
    projection, so re-randomizing the corpus order for each epoch
    costs ZERO shuffles, zero sorts, zero joins (contrast
    :func:`shuffle_shards`, which pays one shuffle per permutation,
    and ORDER BY rand(), which pays a global sort per epoch AND is
    irreproducible across task retries).

    A Feistel network is a permutation of [0, M) by construction for
    ANY round function (split x into b-bit halves L,R; each round maps
    (L,R) -> (R, L xor f_r(R)), trivially invertible), so the N
    occupied slots are distinct, each (epoch, seed) pair yields a
    different-looking permutation, and readers walk the slot sequence
    skipping the M-N empty slots (expected overhead M/N - the standard
    cycle-walking-free schedule). All arithmetic is bigint
    add/multiply/mod/xor - engine-identical, hence the exact oracle.

    ``index_col`` must hold a dense integer index in [0, 2^20) -
    assigned ONCE at ingest (zipWithIndex / shard-offset arithmetic),
    then every epoch of every run reuses it; raise ``_FEISTEL_BITS``
    for bigger corpora (b=18 covers 68G docs). Returns one row per
    (doc, epoch): (id, epoch, slot).
    """
    half = 1 << _FEISTEL_BITS
    # epoch fan-out as a generator, not a cross join: the plan stays a
    # single Project+Generate over the scan (lint_plan-clean - even a
    # 2-row broadcast cross join shows up as BroadcastNestedLoopJoin)
    out = docs.select(
        id_col,
        F.col(index_col).cast("long").alias("_x"),
        F.explode(
            F.array(*[F.lit(e).cast("int") for e in range(epochs)])
        ).alias("epoch"),
    )
    lcol = F.expr(f"_x div {half}")
    rcol = F.col("_x") % F.lit(half)
    for rnd in _FEISTEL_ROUNDS:
        fcol = (
            (rcol + F.lit(1)) * F.lit(rnd)
            + (F.col("epoch").cast("long") + F.lit(1)) * F.lit(seed + 1)
        ) % F.lit(half)
        lcol, rcol = rcol, lcol.bitwiseXOR(fcol)
    slot = lcol * F.lit(half) + rcol
    return out.select(id_col, "epoch", slot.cast("long").alias("slot"))


def priority_sample_grouped(
    docs: DataFrame,
    id_col: str,
    weight_col: str,
    group_col: str,
    *,
    k: int,
) -> DataFrame:
    """Per-group :func:`priority_sample` — weighted quota sampling
    (k docs per source, weighted by quality/length) with the same
    exact-integer DLT machinery, one shuffle total: the global ordered
    limit becomes a rank over a group-partitioned window (Spark pushes
    rank<=k+1 into WindowGroupLimit - per-partition per-group heaps
    before the exchange, so the shuffle carries ~(k+1)*groups rows,
    not the corpus).

    Groups holding <= k rows are sampled exhaustively: their (k+1)-th
    key does not exist, tau_key is reported as -1 and the estimator
    collapses to the exact weight (DLT: an exhaustive sample has no
    sampling error). Everything stays bigint (the priority_sample
    integer contract).
    """
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    keyed = docs.select(
        F.col(group_col),
        F.col(id_col),
        F.col(weight_col).cast("long").alias("w"),
        (u * F.lit(1048576)).alias("_scaled"),
    ).select(group_col, id_col, "w", F.expr("_scaled div w").alias("pkey"))
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col("pkey").asc(), F.col(id_col).asc()
    )
    ranked = keyed.withColumn("_rn", F.row_number().over(w_rank)).filter(
        F.col("_rn") <= k + 1
    )
    w_grp = Window.partitionBy(group_col)
    tau = F.max(F.when(F.col("_rn") == k + 1, F.col("pkey"))).over(w_grp)
    return (
        ranked.withColumn("tau_key", F.coalesce(tau, F.lit(-1)))
        .filter(F.col("_rn") <= k)
        .select(
            group_col,
            id_col,
            "w",
            "pkey",
            "tau_key",
            F.when(F.col("tau_key") < 0, F.col("w"))
            .otherwise(
                F.greatest(
                    F.col("w"),
                    F.expr("4503599627370496 div (tau_key + 1)"),
                )
            )
            .cast("long")
            .alias("est"),
        )
    )


def unimax_allocation(
    docs: DataFrame,
    lang_col: str,
    size_col: str,
    *,
    budget: int,
    epoch_cap: int,
) -> DataFrame:
    """UniMax language-sampling budgets (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): allocate a total training budget over
    languages as uniformly as possible subject to a per-language
    repeat cap — each language contributes at most ``epoch_cap``
    epochs of its own data, and the budget freed by capped (small)
    languages waterfills uniformly over the rest. The published
    alternative to temperature sampling that neither starves head
    languages nor loops tail languages into memorization.

    Exact integer waterfill: with languages ascending by cap
    (``cap = epoch_cap·size``), language j is CAPPED iff
    ``prefix(j−1) + cap_j·(m−j+1) ≤ budget`` (caps ascend, so capped
    languages form a prefix); the uncapped remainder splits as
    ``share = R div m_rem`` with the first ``R mod m_rem`` uncapped
    languages (cap asc, lang asc) taking +1 — every allocation is a
    bigint, sums exactly to min(budget, Σcap), and never exceeds a
    cap (cap > R/m_rem for every uncapped language by the feasibility
    test, so share+1 ≤ cap). Windows run over the LANGUAGE DIMENSION
    (bounded by construction — the one place a global window is the
    right plan); the only corpus-sized work is the per-language size
    aggregate.

    Returns (lang, sz, cap, capped, allocated, epoch_bp) where
    epoch_bp = allocated·10⁴ div sz — how many basis points of an
    epoch each language actually trains.
    """
    sizes = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.sum(F.col(size_col)).cast("long").alias("sz")
    )
    capped_df = sizes.select(
        "lang", "sz", (F.col("sz") * F.lit(epoch_cap)).alias("cap")
    )
    w_ord = Window.orderBy(F.col("cap").asc(), F.col("lang").asc())
    w_all = Window.partitionBy()
    j = F.row_number().over(w_ord)
    prefix = F.sum("cap").over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.count(F.lit(1)).over(w_all)
    staged = capped_df.select(
        "lang", "sz", "cap",
        j.alias("j"),
        (prefix - F.col("cap")).alias("prefix_before"),
        m.alias("m"),
    ).withColumn(
        "capped",
        F.col("prefix_before")
        + F.col("cap") * (F.col("m") - F.col("j") + F.lit(1))
        <= F.lit(budget),
    )
    agg = staged.select(
        "lang", "sz", "cap", "j", "capped",
        F.sum(F.when(F.col("capped"), F.col("cap")).otherwise(0))
        .over(w_all)
        .alias("s_capped"),
        F.sum(F.when(F.col("capped"), 0).otherwise(1))
        .over(w_all)
        .alias("m_rem"),
        F.sum(F.when(F.col("capped"), 0).otherwise(1))
        .over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("uncapped_rank"),
    )
    r_total = F.lit(budget) - F.col("s_capped")
    share = F.expr(f"({budget} - s_capped) div m_rem")
    extra = (
        F.col("uncapped_rank")
        <= r_total - share * F.col("m_rem")
    ).cast("long")
    allocated = F.when(F.col("capped"), F.col("cap")).otherwise(
        share + extra
    )
    return agg.select(
        "lang",
        "sz",
        "cap",
        "capped",
        allocated.cast("long").alias("allocated"),
    ).select(
        "lang",
        "sz",
        "cap",
        "capped",
        "allocated",
        F.expr("allocated * 10000 div sz").cast("long").alias("epoch_bp"),
    )
