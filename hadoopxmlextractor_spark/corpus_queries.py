"""Corpus-construction queries for training-data pipelines: stable
splits, vocabulary statistics, context-window chunking, per-user event
sequences, and duplicate-cluster resolution.

All deterministic (md5-derived hashing, never seeded ``F.hash`` or
``F.rand``), so every query carries an exact DuckDB oracle — including
the iterative connected-components operator, whose oracle is a
recursive CTE computing min-reachable labels over the same pair graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators import corpus as C
from hadoopxmlextractor_spark.operators import dedup as D
from hadoopxmlextractor_spark.operators import similarity as S
from hadoopxmlextractor_spark.operators import text as T
from hadoopxmlextractor_spark import oracles as O
from hadoopxmlextractor_spark.oracles import _hex_byte
from hadoopxmlextractor_spark.queries import query
from hadoopxmlextractor_spark.tables import load

# Big-endian integer of the first 8 md5 hex chars (= bytes 0..3) —
# identical to operators.corpus.stable_bucket's F.conv(substring(md5))
# (verified byte-for-byte in tests/test_corpus.py).
_HEX8 = (
    f"({_hex_byte('hh', 0)} * 16777216 + {_hex_byte('hh', 1)} * 65536"
    f" + {_hex_byte('hh', 2)} * 256 + {_hex_byte('hh', 3)})"
)


@query(
    "corpus_train_val_split",
    f"""
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents
    )
    SELECT doc_id,
           {_HEX8} % 100 AS bucket,
           CASE WHEN {_HEX8} % 100 < 90 THEN 'train' ELSE 'val' END AS split
    FROM h
    """,
)
def q_corpus_train_val_split(spark: SparkSession, sf: str) -> DataFrame:
    # Split-as-a-property-of-the-key: pure projection, no shuffle, no
    # sampling job; re-runs and incremental loads at 100 TB land every
    # row in the same split (what a holdout actually requires).
    docs = load(spark, sf, "documents")
    return C.train_val_split(docs, "doc_id", val_pct=10, n_buckets=100).select(
        "doc_id", "bucket", "split"
    )


@query(
    "corpus_vocabulary",
    r"""
    WITH terms AS (
      SELECT doc_id AS doc,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT term,
           CAST(COUNT(DISTINCT doc) AS BIGINT) AS df,
           CAST(COUNT(*) AS BIGINT) AS cf
    FROM terms GROUP BY term HAVING COUNT(DISTINCT doc) >= 2
    """,
)
def q_corpus_vocabulary(spark: SparkSession, sf: str) -> DataFrame:
    # One shuffle on term; hot (stop-word) terms are absorbed by the
    # map-side partial aggregation, and the result cardinality is the
    # vocabulary size, not the corpus size.
    docs = load(spark, sf, "documents")
    return C.vocabulary(docs, "text", "doc_id", min_df=2)


@query(
    "corpus_chunks",
    r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(
               0, GREATEST(CAST(CEIL(n_tokens / 128.0) AS BIGINT), 1) - 1
             )) AS chunk_idx
      FROM base
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * 128 AS tok_start,
           LEAST((chunk_idx + 1) * 128, n_tokens) AS tok_end
    FROM c
    """,
)
def q_corpus_chunks(spark: SparkSession, sf: str) -> DataFrame:
    # Context-window chunking is per-row arithmetic + posexplode: no
    # shuffle at any scale. Empty documents still emit one [0, 0) chunk
    # so downstream joins never lose a document.
    docs = load(spark, sf, "documents")
    return C.chunk_documents(docs, "text", "doc_id", chunk_tokens=128)


@query(
    "corpus_tfidf",
    r"""
    WITH terms AS (
      SELECT doc_id AS doc,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ), tf AS (
      SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM terms GROUP BY doc, term
    ), dfx AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), nd AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT doc, tf.term AS term, tf, df,
             ROUND(tf * ln((SELECT n FROM nd)::DOUBLE / df), 4) AS tfidf
      FROM tf JOIN dfx ON tf.term = dfx.term
    )
    SELECT doc, term, tf, df, tfidf, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY doc ORDER BY tfidf DESC, term) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q_corpus_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    # The corpus-sized side shuffles once (groupBy doc,term); the
    # vocabulary-sized df table broadcasts back. Rank ties break on the
    # rounded score then term, so Spark and DuckDB agree despite double
    # log arithmetic.
    docs = load(spark, sf, "documents")
    return C.tfidf_top_terms(docs, "text", "doc_id", n_docs=docs.count(), top_k=3)


@query(
    "corpus_quality_filter",
    r"""
    WITH base AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS n_distinct
      FROM documents
    ), sig AS (
      SELECT doc_id, n_tokens,
             ROUND(n_distinct / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 4)
               AS distinct_ratio,
             ROUND((n_chars - n_tokens + 1) / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 4)
               AS mean_token_len
      FROM base
    )
    SELECT doc_id, n_tokens, distinct_ratio, mean_token_len,
           (n_tokens >= 40 AND n_tokens <= 5000
            AND distinct_ratio >= 0.35 AND mean_token_len <= 8.0) AS keep
    FROM sig
    """,
)
def q_corpus_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    # Rule-based (Gopher-style) cleaning verdict per document: pure JVM
    # expressions over one scan — runs at scan bandwidth at any scale.
    docs = load(spark, sf, "documents")
    return C.quality_filter(docs, "text", "doc_id")


@query(
    "corpus_user_sequences",
    """
    WITH ranked AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS cnt
      FROM events
    )
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS sequence,
           CAST(MAX(cnt) AS BIGINT) AS n_events
    FROM ranked WHERE rn <= 1000 GROUP BY user_id
    """,
)
def q_corpus_user_sequences(spark: SparkSession, sf: str) -> DataFrame:
    # Behavioral-sequence construction: one shuffle on user_id (window
    # and groupBy share the partitioning); the rank filter caps per-user
    # aggregation state at max_events_per_user while n_events reports
    # the uncapped total, and array_sort over the collected
    # (ts, event_id, type) structs makes the ordering deterministic
    # (ties broken by the unique event id), which a bare
    # collect_list-then-concat would not be.
    events = load(spark, sf, "events")
    return C.user_event_sequences(events, max_events_per_user=1000)


@query(
    "dedup_clusters",
    r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION
      SELECT doc_b AS x, doc_a AS y FROM pairs
    ), reach(x, y) AS (
      SELECT x, x FROM (SELECT DISTINCT x FROM edges)
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    )
    SELECT x AS doc_id, MIN(y) AS component_id, (x = MIN(y)) AS is_canonical
    FROM reach GROUP BY x
    """,
)
def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    # Pairs → clusters: min-label propagation over the near-dup graph
    # (2 shuffles/round, O(diameter) rounds; near-dup graphs are unions
    # of small cliques so 2-4 rounds in practice). The oracle replays
    # reachability with a recursive CTE — an exact check for an
    # operator SQL can't express in one query.
    docs = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    return D.connected_components(pairs)


@query(
    "dedup_clusters_incremental",
    r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION
      SELECT doc_b AS x, doc_a AS y FROM pairs
    ), reach(x, y) AS (
      SELECT x, x FROM (SELECT DISTINCT x FROM edges)
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    )
    SELECT x AS doc_id, MIN(y) AS component_id, (x = MIN(y)) AS is_canonical
    FROM reach GROUP BY x
    """,
)
def q_dedup_clusters_incremental(spark: SparkSession, sf: str) -> DataFrame:
    # Continuous-ingest cluster MAINTENANCE: docs with doc_id % 3 != 0
    # are the standing corpus (labels already resolved); the rest are
    # the newly-landed batch. Old connectivity rides forward as the
    # label star graph (doc -> component id), so only pairs touching a
    # NEW doc are generated this round — the old pair set never
    # recurs. The oracle is DELIBERATELY the from-scratch recompute
    # over the full pair graph (the dedup_clusters CTE verbatim): the
    # incremental algebra must land on it exactly, including clusters
    # that a new bridge doc MERGES across old components.
    docs = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    pairs = pairs.persist()
    pairs.count()  # feeds the old/new split below twice
    is_new_a = (F.col("doc_a") % 3 == 0)
    is_new_b = (F.col("doc_b") % 3 == 0)
    old_pairs = pairs.filter(~is_new_a & ~is_new_b)
    new_pairs = pairs.filter(is_new_a | is_new_b)
    labels = D.connected_components(old_pairs)
    return D.connected_components_incremental(labels, new_pairs)


@query(
    "dedup_semantic_clusters",
    O.semantic_clusters_lsh_oracle(threshold=0.45, dim=64, n_planes=4, n_tables=8),
)
def q_dedup_semantic_clusters(spark: SparkSession, sf: str) -> DataFrame:
    # Embedding-cosine near-dup as a DEDUP operator (not just search):
    # LSH-bucketed near-pair generation (seeded hyperplane sketch, one
    # shuffle, numpy pair-cosine verify within buckets — NOT the O(n²)
    # all-pairs broadcast join, which survives only as the
    # `embedding_near_pairs` oracle baseline) feeding the same
    # min-label cluster resolution as the text path, picking one
    # canonical member per semantic cluster. The bucketing is
    # deterministic, so the oracle replays it exactly.
    emb = load(spark, sf, "embeddings")
    pairs = S.cosine_pairs_lsh(emb, threshold=0.45, dim=64, n_planes=4, n_tables=8)
    return D.connected_components(pairs, "id_a", "id_b").select(
        F.col("doc_id").alias("vec_id"), "component_id", "is_canonical"
    )


@query(
    "corpus_stratified_sample",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
)
def q_corpus_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic stratified sampling: exactly k docs per source
    # stratum, chosen by hash rank — reproducible across runs and
    # incremental loads, unlike rand()-based sampling. One shuffle on
    # the stratum key; each partition keeps a bounded k-row heap via
    # the rank-filter pushdown (WindowGroupLimit), so a hot stratum
    # never materializes its full membership.
    docs = load(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "source")
    )


@query(
    "corpus_pack_sequences",
    f"""
    WITH sharded AS (
      SELECT doc_id,
             {_HEX8} % 32 AS shard,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM (SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents)
    ),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_offset
      FROM sharded
    )
    SELECT doc_id, shard, CAST(start_offset AS BIGINT) AS start_offset,
           CAST(FLOOR(start_offset / 256.0) AS BIGINT) AS seq_idx, n_tokens
    FROM packed
    """,
)
def q_corpus_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    # Pre-training sequence packing: running token offsets within hash
    # shards → fixed-capacity sequence assignment. One shard-keyed
    # shuffle; the running sum is a streaming window frame. All-integer
    # arithmetic, so the oracle replays it exactly.
    docs = load(spark, sf, "documents")
    return C.pack_sequences(docs, "text", "doc_id", capacity=256, n_shards=32)


@query(
    "corpus_prepare_training_data",
    rf"""
    WITH sig AS (
      SELECT doc_id, text,
             n_tokens,
             ROUND(n_distinct / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 4)
               AS distinct_ratio,
             ROUND((n_chars - n_tokens + 1)
                   / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 4)
               AS mean_token_len
      FROM (
        SELECT doc_id, text,
               length(text) AS n_chars,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               len(list_distinct(
                 regexp_split_to_array(trim(lower(text)), '\s+'))) AS n_distinct
        FROM documents
      )
    ),
    kept AS (
      SELECT doc_id, text FROM sig
      WHERE n_tokens >= 40 AND n_tokens <= 5000
        AND distinct_ratio >= 0.35 AND mean_token_len <= 8.0
    ),
    ded AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    ),
    shb AS (
      SELECT doc_id, {_HEX8} % 100 >= 95 AS benchmark,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
                   md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents)
    ),
    contaminated AS (
      SELECT DISTINCT c.doc_id
      FROM shb c JOIN shb b ON NOT c.benchmark AND b.benchmark
      WHERE len(list_intersect(c.shingles, b.shingles)) >= 10
    ),
    clean AS (
      SELECT doc_id, text, hh FROM (
        SELECT d.doc_id, d.text, md5(CAST(d.doc_id AS VARCHAR)) AS hh
        FROM ded d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      ) WHERE {_HEX8} % 100 < 95
    ),
    sharded AS (
      SELECT doc_id, {_HEX8} % 32 AS shard,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM clean
    ),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_offset
      FROM sharded
    )
    SELECT doc_id, shard, CAST(start_offset AS BIGINT) AS start_offset,
           CAST(FLOOR(start_offset / 256.0) AS BIGINT) AS seq_idx, n_tokens
    FROM packed
    """,
)
def q_corpus_prepare_training_data(spark: SparkSession, sf: str) -> DataFrame:
    # The FLAGSHIP composed pipeline: quality filter -> exact dedup ->
    # benchmark decontamination -> deterministic sequence packing, the
    # whole corpus-prep job as one lazy plan, exact-oracled end to end.
    # Stage shapes (all individually plan-audited by their standalone
    # queries): the quality verdict rides the scan (carry= keeps text in
    # the same projection, no join-back); dedup is one uniform
    # md5-digest shuffle; contamination is the broadcast inverted-index
    # join (eval side is tiny by construction at any scale) feeding a
    # left-anti; packing is one shard-keyed shuffle with a streaming
    # running-sum frame.
    docs = load(spark, sf, "documents")
    kept = (
        C.quality_filter(docs, "text", "doc_id", carry=("text",))
        .filter("keep")
        .select("doc_id", "text")
    )
    ded = D.dedup_exact(kept, "text", "doc_id").select("doc_id", "text")

    # r14-opt: split on the benchmark bucket BEFORE the shingle UDF.
    # The UDF is nondeterministic-marked (guide §4.4, stops optimizer
    # duplication), so the bucket filter no longer pushes below it on
    # its own — applying it structurally first keeps each branch
    # shingling only its own rows (95% / 5%), as the pushed-down
    # baseline did, minus the per-branch double evaluation.
    base = docs.withColumn("bucket", C.stable_bucket("doc_id", 100))
    train = (
        base.filter(F.col("bucket") < 95)
        .select("doc_id", D.shingle_hashes("text", 3).alias("shingles"))
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )
    bench = (
        base.filter(F.col("bucket") >= 95)
        .select(
            F.col("doc_id").alias("benchmark_doc"),
            D.shingle_hashes("text", 3).alias("shingles"),
        )
        .select("benchmark_doc", F.explode("shingles").alias("shingle"))
    )
    contaminated = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "benchmark_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 10)
        .select("doc_id")
        .distinct()
    )
    clean = (
        ded.filter(C.stable_bucket("doc_id", 100) < 95)
        .join(contaminated, "doc_id", "left_anti")
    )
    return C.pack_sequences(clean, "text", "doc_id", capacity=256, n_shards=32)


@query(
    "dedup_incremental",
    f"""
    WITH tagged AS (
      SELECT doc_id, md5(text) AS h,
             {_HEX8} % 100 >= 80 AS incoming
      FROM (SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents)
    ),
    corpus AS (SELECT DISTINCT h FROM tagged WHERE NOT incoming)
    SELECT t.doc_id,
           (c.h IS NOT NULL) AS dup_of_corpus,
           (ROW_NUMBER() OVER (PARTITION BY t.h ORDER BY t.doc_id) > 1)
             AS dup_in_batch
    FROM tagged t LEFT JOIN corpus c ON t.h = c.h
    WHERE t.incoming
    """,
)
def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    # Incremental ingestion dedup — the shape a production corpus
    # actually runs: a NEW batch (here the top-20% hash split stands in
    # for today's crawl) is checked against the EXISTING corpus's
    # content-hash index AND against itself. At 100 TB the corpus side
    # is a bucketed/partitioned hash index on disk, so the anti-join
    # prunes to matching buckets; batch-internal dups fall out of one
    # window over the (small) batch. Left join + flags (not anti join)
    # so the caller sees WHY a doc was dropped.
    docs = load(spark, sf, "documents").withColumn(
        "bucket", C.stable_bucket("doc_id", 100)
    )
    tagged = docs.select(
        "doc_id", F.md5("text").alias("h"), (F.col("bucket") >= 80).alias("incoming")
    )
    corpus = tagged.filter(~F.col("incoming")).select("h").distinct()
    batch = tagged.filter(F.col("incoming"))
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        batch.join(
            # NO broadcast hint: the corpus index is the BIG side at
            # scale — the join must shuffle on the uniform md5 key (or
            # probe a bucketed on-disk index); AQE may still demote to
            # broadcast at small SF, which is correct there.
            corpus.withColumn("corpus_hit", F.lit(True)),
            "h",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("corpus_hit"), F.lit(False)).alias("dup_of_corpus"),
            (F.row_number().over(w) > 1).alias("dup_in_batch"),
        )
    )


@query(
    "corpus_decontaminate",
    f"""
    WITH sh AS (
      SELECT doc_id,
             {_HEX8} % 100 >= 95 AS benchmark,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
                   md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents)
    )
    SELECT c.doc_id, b.doc_id AS benchmark_doc,
           CAST(len(list_intersect(c.shingles, b.shingles)) AS BIGINT)
             AS n_shared
    FROM sh c JOIN sh b ON NOT c.benchmark AND b.benchmark
    WHERE len(list_intersect(c.shingles, b.shingles)) >= 10
    """,
)
def q_corpus_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    # Benchmark decontamination: flag training docs sharing ≥10 distinct
    # 3-gram shingles with any eval-set doc (the top-5% hash split
    # stands in for the benchmark suite). Same inverted-index join as
    # n-gram dedup — shingles explode, join on the 64-bit hash, count
    # per (train, benchmark) pair — NEVER a cross join: at 100 TB the
    # benchmark side is tiny, so its exploded index broadcasts and the
    # train side streams through map-side. The oracle brute-forces
    # list_intersect over the same split.
    # r14-opt: bucket split BEFORE the (nondeterministic-marked)
    # shingle UDF — see corpus_prepare_training_data's note.
    base = load(spark, sf, "documents").withColumn(
        "bucket", C.stable_bucket("doc_id", 100)
    )
    train = (
        base.filter(F.col("bucket") < 95)
        .select("doc_id", D.shingle_hashes("text", 3).alias("shingles"))
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )
    bench = (
        base.filter(F.col("bucket") >= 95)
        .select(
            F.col("doc_id").alias("benchmark_doc"),
            D.shingle_hashes("text", 3).alias("shingles"),
        )
        .select("benchmark_doc", F.explode("shingles").alias("shingle"))
    )
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "benchmark_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 10)
    )


@query(
    "corpus_mix_weights",
    """
    WITH per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_sources
            FROM per_source)
    SELECT source, n_docs,
           ROUND(LEAST(1.0,
                 (CAST(total AS DOUBLE) / n_sources) / n_docs), 6)
             AS sample_rate,
           CAST(FLOOR(LEAST(1.0,
                 (CAST(total AS DOUBLE) / n_sources) / n_docs) * n_docs)
                AS BIGINT) AS expected_docs
    FROM per_source, tot
    """,
)
def q_corpus_mix_weights(spark: SparkSession, sf: str) -> DataFrame:
    # Data-mixture weighting: per-source sampling rates that equalize
    # source shares (capped at keeping every doc of under-represented
    # sources) — the arithmetic every mixture-rebalancing job runs
    # before sampling. Two tiny aggregates; the global totals broadcast
    # back as a 1-row cross join. All-double arithmetic in the same
    # order on both sides; FLOOR for expected counts.
    per_source = (
        load(spark, sf, "documents").groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = per_source.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    rate = F.least(
        F.lit(1.0), (F.col("total").cast("double") / F.col("n_sources")) / F.col("n_docs")
    )
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(rate, 6).alias("sample_rate"),
            F.floor(rate * F.col("n_docs")).cast("long").alias("expected_docs"),
        )
    )


@query(
    "corpus_temperature_sample",
    f"""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total, SUM(SQRT(n_docs)) AS w_sum
      FROM per
    ),
    rates AS (
      SELECT source, n_docs,
             ROUND(LEAST(1.0,
                   SQRT(n_docs) / w_sum * CAST(total AS DOUBLE) / n_docs),
                   6) AS keep_rate
      FROM per, tot
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS c
      FROM (SELECT source, md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents) d
      JOIN rates r ON d.source = r.source
      WHERE {_HEX8} % 10000
            < CAST(FLOOR(r.keep_rate * 10000.0) AS BIGINT)
      GROUP BY d.source
    )
    SELECT r.source, r.n_docs, r.keep_rate,
           CAST(COALESCE(k.c, 0) AS BIGINT) AS n_kept
    FROM rates r LEFT JOIN kept k ON r.source = k.source
    """,
)
def q_corpus_temperature_sample(spark: SparkSession, sf: str) -> DataFrame:
    # Temperature-weighted source resampling (alpha=0.5): the
    # data-mixture flattening step — p(s) ∝ n_s^0.5 with the keep rate
    # capped at 1 — applied as a deterministic md5-bucket Bernoulli per
    # row, then audited per source. A flipped keep decision anywhere
    # changes n_kept, so the oracle validates every row's verdict
    # through the aggregate. The rates frame is dimension-sized; it
    # feeds both the sampling broadcast and the final report, and its
    # lineage holds a corpus scan, so persist + eager count per the
    # AQE cache-race rule.
    docs = load(spark, sf, "documents")
    rates = C.temperature_rates(docs, "source", alpha=0.5).persist()
    rates.count()
    kept = C.temperature_sample(docs, "source", "doc_id", rates=rates)
    counts = kept.groupBy("source").agg(F.count(F.lit(1)).alias("_c"))
    return rates.join(F.broadcast(counts), "source", "left").select(
        "source",
        "n_docs",
        "keep_rate",
        F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("n_kept"),
    )


@query(
    "corpus_span_dedup",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
             generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1)
               AS pos
      FROM documents
    ),
    spans AS (
      SELECT doc_id,
             CAST(floor((pos - 1) / 3) AS BIGINT) AS span_idx,
             string_agg(tok, ' ' ORDER BY pos) AS span
      FROM toks GROUP BY doc_id, span_idx
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY md5(span)
                                ORDER BY doc_id, span_idx) AS rn
      FROM spans
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(span, ' ' ORDER BY span_idx)
                      FILTER (WHERE rn = 1), '') AS text_deduped
    FROM ranked GROUP BY doc_id
    """,
)
def q_corpus_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # C4-style duplicated-span removal (the "three-sentence span"
    # dedup of arxiv:1910.10683 §2.2, scaled to token spans since the
    # synthetic corpus has no sentence boundaries): first occurrence
    # of each exact 3-token span survives corpus-wide, documents are
    # rebuilt from surviving spans. The oracle replays segmentation,
    # first-occurrence ranking, and reconstruction relationally.
    docs = load(spark, sf, "documents")
    return C.span_dedup(docs, "text", "doc_id", span_tokens=3)


@query(
    "corpus_unigram_logprob",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    probs AS (
      SELECT tok,
             CAST(c AS DOUBLE) / (SELECT CAST(SUM(c) AS DOUBLE) FROM vocab)
               AS p
      FROM vocab
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(-AVG(ln(p)), 6) AS avg_neg_logprob,
           ROUND(exp(-AVG(ln(p))), 6) AS perplexity
    FROM toks JOIN probs USING (tok)
    GROUP BY doc_id
    """,
)
def q_corpus_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    # Perplexity-proxy quality scoring: the filter CCNet/RefinedWeb run
    # before training, with the LM collapsed to the corpus unigram
    # distribution so both engines recompute the identical score.
    docs = load(spark, sf, "documents")
    return C.unigram_logprob(docs, "text", "doc_id")


@query(
    "corpus_shuffle_shards",
    f"""
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents
    )
    SELECT doc_id,
           {_HEX8} % 8 AS shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY {_HEX8} % 8
                                   ORDER BY hh, doc_id) - 1 AS BIGINT)
             AS pos_in_shard
    FROM h
    """,
)
def q_corpus_shuffle_shards(spark: SparkSession, sf: str) -> DataFrame:
    # The "shuffle the corpus before writing training shards" step:
    # deterministic md5 permutation, shard-local positions, one
    # uniform-key shuffle — never a global contiguous rank.
    docs = load(spark, sf, "documents")
    return C.shuffle_shards(docs, "doc_id", n_shards=8)


@query(
    "corpus_length_buckets",
    r"""
    WITH lens AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT quantile_cont(n_tokens, 0.25) AS q0,
             quantile_cont(n_tokens, 0.50) AS q1,
             quantile_cont(n_tokens, 0.75) AS q2
      FROM lens
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens > q0 AS INT) + CAST(n_tokens > q1 AS INT)
             + CAST(n_tokens > q2 AS INT) AS bucket
    FROM lens, b
    """,
)
def q_corpus_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    # Sequence-length bucketing for padding-efficient batching: exact
    # quartile boundaries from ONE percentile aggregate (state bounded
    # by distinct lengths ≤ context window, not corpus size) broadcast
    # back over the scan — never the NTILE global-sort window, which is
    # a single-task cliff at scale. Dyadic quantiles over integer
    # lengths interpolate to exactly-representable doubles, so the
    # oracle reproduces the boundaries digit-for-digit.
    docs = load(spark, sf, "documents")
    return C.length_buckets(docs, "text", "doc_id")


@query(
    "corpus_tokenize_ids",
    r"""
    WITH terms AS (
      SELECT doc_id AS doc,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    vocab AS (
      SELECT term, COUNT(DISTINCT doc) AS df
      FROM terms GROUP BY term HAVING COUNT(DISTINCT doc) >= 2
    ),
    ids AS (
      SELECT term,
             CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) AS INT) AS token_id
      FROM vocab
    ),
    toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token,
             generate_subscripts(regexp_split_to_array(trim(lower(text)), '\s+'), 1)
               - 1 AS pos
      FROM documents WHERE trim(text) <> ''
    )
    SELECT t.doc_id, CAST(t.pos AS INT) AS pos, t.token,
           CAST(COALESCE(i.token_id, 0) AS INT) AS token_id
    FROM toks t LEFT JOIN ids i ON t.token = i.term
    """,
)
def q_corpus_tokenize_ids(spark: SparkSession, sf: str) -> DataFrame:
    # Text → token-id rows, the step between vocabulary construction
    # and packing: ids ranked (df DESC, term) over the vocabulary, OOV
    # (df < 2) mapped to id 0. The id table is vocabulary-bounded and
    # BROADCASTS to the exploded token stream — a raw-token shuffle
    # join would put every stop word on one reducer; positions come
    # from posexplode, so the corpus side never shuffles at all.
    docs = load(spark, sf, "documents")
    return C.tokenize_ids(docs, "text", "doc_id", min_df=2)


@query(
    "corpus_bigram_logprob",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
             generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1)
               AS pos
      FROM documents WHERE trim(text) <> ''
    ),
    pairs AS (
      SELECT doc_id, tok AS prefix,
             tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
               AS bg
      FROM toks
      QUALIFY lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
    ),
    bg_counts AS (
      SELECT prefix, bg, COUNT(*) AS c_bg FROM pairs GROUP BY prefix, bg
    ),
    prefix_counts AS (
      SELECT prefix, COUNT(*) AS c_prefix FROM pairs GROUP BY prefix
    ),
    probs AS (
      SELECT bg, CAST(c_bg AS DOUBLE) / c_prefix AS p
      FROM bg_counts JOIN prefix_counts USING (prefix)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(-AVG(ln(p)), 6) AS avg_neg_logprob,
           ROUND(exp(-AVG(ln(p))), 6) AS perplexity
    FROM pairs JOIN probs USING (bg)
    GROUP BY doc_id
    """,
)
def q_corpus_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    # Second-order (conditional) LM perplexity against the corpus's own
    # bigram distribution: catches token streams that are individually
    # common but improbably ordered — invisible to the unigram scorer.
    # One doc-keyed shuffle builds successor pairs; bigram/prefix count
    # tables broadcast to the scoring join (stop-word keys never
    # shuffle).
    docs = load(spark, sf, "documents")
    return C.bigram_logprob(docs, "text", "doc_id")


@query(
    "corpus_contamination_score",
    f"""
    WITH sh AS (
      SELECT doc_id,
             {_HEX8} % 100 >= 95 AS benchmark,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
                   md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents)
    ),
    bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE benchmark),
    tr AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE NOT benchmark),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS total, COUNT(b.s) AS hit
      FROM tr t LEFT JOIN bench b USING (s) GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(total AS BIGINT) AS n_shingles,
           CAST(hit AS BIGINT) AS n_contaminated,
           ROUND(hit / CAST(total AS DOUBLE), 6) AS overlap_pct
    FROM hits
    """,
)
def q_corpus_contamination_score(spark: SparkSession, sf: str) -> DataFrame:
    # Graded contamination audit — the scored refinement of the binary
    # corpus_decontaminate flag (GPT-3 appendix-style n-gram overlap
    # measurement): for every training doc, the fraction of its
    # distinct 3-gram shingles that appear anywhere in the benchmark
    # split. The benchmark shingle set is tiny and BROADCASTS; the
    # train side streams through map-side with one doc-keyed aggregate
    # — cost is one corpus scan regardless of benchmark count.
    # r14-opt: bucket split BEFORE the (nondeterministic-marked)
    # shingle UDF — see corpus_prepare_training_data's note.
    base = load(spark, sf, "documents").withColumn(
        "bucket", C.stable_bucket("doc_id", 100)
    )
    bench = (
        base.filter(F.col("bucket") >= 95)
        .select(D.shingle_hashes("text", 3).alias("shingles"))
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = (
        base.filter(F.col("bucket") < 95)
        .select("doc_id", D.shingle_hashes("text", 3).alias("shingles"))
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )
    return (
        train.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_shingles").cast("double"), 6
            ).alias("overlap_pct"),
        )
    )


@query(
    "corpus_source_quality",
    r"""
    WITH sig AS (
      SELECT source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS n_tokens,
             ROUND(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')))
                   / GREATEST(CAST(len(regexp_split_to_array(trim(text), '\s+'))
                              AS DOUBLE), 1.0), 4) AS distinct_ratio,
             ROUND((length(text) - len(regexp_split_to_array(trim(text), '\s+')) + 1)
                   / GREATEST(CAST(len(regexp_split_to_array(trim(text), '\s+'))
                              AS DOUBLE), 1.0), 4) AS mean_token_len
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(distinct_ratio AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
             AS avg_distinct_ratio,
           CAST(SUM(CASE WHEN n_tokens >= 40 AND n_tokens <= 5000
                          AND distinct_ratio >= 0.35
                          AND mean_token_len <= 8.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
    FROM sig GROUP BY source
    """,
)
def q_corpus_source_quality(spark: SparkSession, sf: str) -> DataFrame:
    # Per-source quality dashboard — the monitoring aggregate every
    # corpus pipeline runs per ingest: doc/token volume, mean
    # distinct-token ratio, and how many docs survive the Gopher-style
    # keep verdict, per source. Composes quality_filter (pure
    # scan-bandwidth JVM signals) with one dimension-sized aggregate;
    # ratio means accumulate as DECIMAL over the ROUNDED 4-decimal
    # signals so per-engine summation order cannot drift the double.
    docs = load(spark, sf, "documents")
    q = C.quality_filter(docs, "text", "doc_id", carry=("source",))
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (
            F.sum(F.col("distinct_ratio").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_distinct_ratio"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_keep"),
    )


@query(
    "dedup_cluster_sizes",
    r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION
      SELECT doc_b AS x, doc_a AS y FROM pairs
    ), reach(x, y) AS (
      SELECT x, x FROM (SELECT DISTINCT x FROM edges)
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    ), comp AS (
      SELECT x AS doc_id, MIN(y) AS component_id FROM reach GROUP BY x
    ), sizes AS (
      SELECT component_id, COUNT(*) AS cluster_size FROM comp
      GROUP BY component_id
    ), hist AS (
      SELECT cluster_size, COUNT(*) AS n_clusters FROM sizes
      GROUP BY cluster_size
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(n_clusters AS BIGINT) AS n_clusters,
           CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
    FROM hist
    UNION ALL
    SELECT 1,
           CAST((SELECT COUNT(*) FROM documents)
                - (SELECT COUNT(*) FROM comp) AS BIGINT),
           CAST((SELECT COUNT(*) FROM documents)
                - (SELECT COUNT(*) FROM comp) AS BIGINT)
    """,
)
def q_dedup_cluster_sizes(spark: SparkSession, sf: str) -> DataFrame:
    # The headline dedup metric: duplicate-cluster size histogram
    # (how much of the corpus is duplicated, and in what clump sizes —
    # what you read before choosing dedup aggressiveness). Components
    # come from the same min-label propagation as dedup_clusters; the
    # histogram is two dimension-sized aggregates on top, plus one
    # singleton row (docs in no near-dup pair) computed from counts.
    # comp is persisted eagerly — it feeds the size aggregate and the
    # singleton count.
    docs = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    comp = D.connected_components(pairs).persist()
    in_clusters = comp.count()  # eager (also the singleton arithmetic)
    singletons = docs.count() - in_clusters
    hist = (
        comp.groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long"),
            F.col("n_clusters").cast("long"),
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
    )
    extra = spark.createDataFrame(
        [(1, singletons, singletons)], "cluster_size long, n_clusters long, n_docs long"
    )
    return hist.unionByName(extra)


@query(
    "corpus_chunk_text",
    r"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, w, n_tokens,
             unnest(generate_series(
               0, GREATEST(CAST(CEIL(n_tokens / 128.0) AS BIGINT), 1) - 1
             )) AS chunk_idx
      FROM base
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(LEAST((chunk_idx + 1) * 128, n_tokens)
                - chunk_idx * 128 AS INT) AS n_tokens,
           CASE WHEN n_tokens = 0 THEN ''
                ELSE array_to_string(
                  w[chunk_idx * 128 + 1 : LEAST((chunk_idx + 1) * 128, n_tokens)],
                  ' ') END AS chunk_text
    FROM c
    """,
)
def q_corpus_chunk_text(spark: SparkSession, sf: str) -> DataFrame:
    # Chunking with the text materialized — the tokenizer-input form of
    # corpus_chunks. slice + array_join are plain Catalyst expressions
    # (no interpreted lambda HOFs), so the whole query stays one
    # zero-shuffle codegen projection per chunk row.
    docs = load(spark, sf, "documents")
    return C.chunk_text(docs, "text", "doc_id", chunk_tokens=128)


@query(
    "corpus_pack_chunks",
    rf"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(
               0, GREATEST(CAST(CEIL(n_tokens / 128.0) AS BIGINT), 1) - 1
             )) AS chunk_idx
      FROM base
    ), ch AS (
      SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)
               AS chunk_key,
             CAST(LEAST((chunk_idx + 1) * 128, n_tokens) - chunk_idx * 128
                  AS BIGINT) AS n_tokens
      FROM c
    ), sharded AS (
      SELECT chunk_key, {{_HEX8}} % 32 AS shard, n_tokens
      FROM (SELECT chunk_key, n_tokens, md5(chunk_key) AS hh FROM ch)
    ), packed AS (
      SELECT chunk_key, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY chunk_key
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_offset
      FROM sharded
    )
    SELECT chunk_key, shard, CAST(start_offset AS BIGINT) AS start_offset,
           CAST(FLOOR(start_offset / 256.0) AS BIGINT) AS seq_idx, n_tokens
    FROM packed
    """.replace("{_HEX8}", _HEX8),
)
def q_corpus_pack_chunks(spark: SparkSession, sf: str) -> DataFrame:
    # The chunk-then-pack composition real pre-training prep runs:
    # long documents are split into 128-token context chunks FIRST
    # (bounding any single item at the context window), then chunks
    # bin-pack into capacity-256 sequences by running offset within
    # hash shards. Chunking is a zero-shuffle projection; packing adds
    # its single shard-keyed window shuffle — the whole composition is
    # ONE shuffle, all-integer arithmetic, exactly replayed by the
    # oracle.
    docs = load(spark, sf, "documents")
    chunks = C.chunk_text(docs, "text", "doc_id", chunk_tokens=128).select(
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string")
        ).alias("chunk_key"),
        "chunk_text",
    )
    return C.pack_sequences(chunks, "chunk_text", "chunk_key", capacity=256, n_shards=32)


@query(
    "dedup_survivors",
    r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION
      SELECT doc_b AS x, doc_a AS y FROM pairs
    ), reach(x, y) AS (
      SELECT x, x FROM (SELECT DISTINCT x FROM edges)
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    ), losers AS (
      SELECT x FROM reach GROUP BY x HAVING x <> MIN(y)
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d WHERE d.doc_id NOT IN (SELECT x FROM losers)
    """,
)
def q_dedup_survivors(spark: SparkSession, sf: str) -> DataFrame:
    # The near-dup pipeline's ACTUAL deliverable: the corpus after
    # removing every non-canonical near-dup cluster member (keep the
    # min-id representative per cluster, keep all singletons). Pairs →
    # components → anti join back onto the corpus; the anti join
    # shuffles on doc_id (uniform) and the loser side is only the
    # clustered minority, so at 100 TB the dominant cost stays the
    # pair generation the other dedup queries already bound.
    docs = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    losers = (
        D.connected_components(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "source", "n_chars"
    )


@query(
    "corpus_upsert",
    """
    WITH batch AS (
      SELECT doc_id, upper(text) AS text, source, FALSE AS is_delete
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id, text, source, TRUE FROM documents WHERE doc_id % 10 = 5
      UNION ALL
      SELECT doc_id + 1000000, text, source, FALSE
      FROM documents WHERE doc_id % 10 = 3
    ),
    merged AS (
      SELECT d.doc_id, d.text, d.source FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM batch)
      UNION ALL
      SELECT doc_id, text, source FROM batch WHERE NOT is_delete
    )
    SELECT doc_id, md5(text) AS text_hash, source FROM merged
    """,
)
def q_corpus_upsert(spark: SparkSession, sf: str) -> DataFrame:
    # Copy-on-write MERGE over the corpus: a deterministic synthetic
    # batch updates every doc_id%10==0 (re-crawl), deletes every
    # %10==5 (takedown), inserts shifted copies of %10==3 (new crawl).
    # One broadcast anti join + union — the exact relational core of a
    # lakehouse MERGE INTO.
    docs = load(spark, sf, "documents").select("doc_id", "text", "source")
    updates = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.upper("text").alias("text"), "source",
        F.lit(False).alias("is_delete"),
    )
    deletes = docs.filter(F.col("doc_id") % 10 == 5).select(
        "doc_id", "text", "source", F.lit(True).alias("is_delete")
    )
    inserts = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source",
        F.lit(False).alias("is_delete"),
    )
    batch = updates.unionByName(deletes).unionByName(inserts)
    merged = C.upsert(docs, batch, "doc_id", delete_col="is_delete")
    return merged.select(
        "doc_id", F.md5(F.col("text")).alias("text_hash"), "source"
    )


@query(
    "corpus_profile",
    """
    SELECT 'doc_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'text', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(text) AS BIGINT),
           CAST(COUNT(DISTINCT text) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(lang) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(source) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
           CAST(COUNT(DISTINCT n_chars) AS BIGINT) FROM documents
    """,
)
def q_corpus_profile(spark: SparkSession, sf: str) -> DataFrame:
    # Deequ-style column profiling (row count, null count, distinct
    # count per column) in ONE scan: the multi-countDistinct aggregate
    # compiles to a single Expand(×columns) pass — 5× the rows through
    # one exchange, vs the naive per-column UNION's 5 separate scans
    # (which is what the oracle spells, since DuckDB reads the 500-row
    # view cheaply). The stack() unpivot turns the wide aggregate row
    # into the (col_name, metric...) audit table. At 100 TB swap
    # countDistinct for approx_count_distinct per column and the Expand
    # collapses back to one pass of HLL sketches.
    docs = load(spark, sf, "documents")
    wide = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            x
            for c in ("doc_id", "text", "lang", "source", "n_chars")
            for x in (
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"),
                F.countDistinct(c).alias(f"{c}_distinct"),
            )
        ],
    )
    stack = ", ".join(
        f"'{c}', {c}_nulls, {c}_distinct"
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    )
    return wide.selectExpr(
        f"stack(5, {stack}) AS (col_name, n_nulls, n_distinct)", "n_rows"
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


@query(
    "dedup_graph_triangles",
    r"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS x, b.doc_id AS y
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), tri AS (
      SELECT e1.x AS a, e1.y AS b, e2.y AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.x = e1.y
      JOIN pairs e3 ON e3.x = e1.x AND e3.y = e2.y
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT a AS doc_id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY doc_id
    """,
)
def q_dedup_graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    # Per-document triangle counts over the near-dup graph — the
    # clustering-coefficient numerator that separates tight boilerplate
    # FAMILIES (mutual near-dups, many triangles) from chains of
    # incidental pairwise overlap (zero triangles). The a<b<c edge
    # orientation enumerates each triangle exactly once; both triangle
    # joins shuffle on document ids (uniform), and the per-node degree
    # is bounded upstream by the inverted index's df cap, so the
    # e1⋈e2 fan-out stays near |E|·avg_degree rather than |V|².
    docs = load(spark, sf, "documents")
    pairs = (
        D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
        .select(F.col("doc_a").alias("x"), F.col("doc_b").alias("y"))
        .persist()
    )
    pairs.count()  # eager: feeds all three triangle-join branches
    e1 = pairs.select(F.col("x").alias("a"), F.col("y").alias("b"))
    e2 = pairs.select(F.col("x").alias("b"), F.col("y").alias("c"))
    e3 = pairs.select(F.col("x").alias("a"), F.col("y").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    roles = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    return roles.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


@query(
    "corpus_chunks_overlap",
    r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(
               0, CAST(CEIL(GREATEST(n_tokens - 128, 0) / 64.0) AS BIGINT)
             )) AS chunk_idx
      FROM base
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           chunk_idx * 64 AS tok_start,
           LEAST(chunk_idx * 64 + 128, n_tokens) AS tok_end
    FROM c
    """,
)
def q_corpus_chunks_overlap(spark: SparkSession, sf: str) -> DataFrame:
    # Strided (overlapping) context windows — chunk 128, stride 64, so
    # every boundary token appears in two chunks and no span loses its
    # context (the RAG convention). Same zero-shuffle posexplode
    # arithmetic as the disjoint tiling; the window count formula stops
    # at the first window that reaches the document end.
    docs = load(spark, sf, "documents")
    return C.chunk_documents(docs, "text", "doc_id", chunk_tokens=128, stride=64)


@query(
    "corpus_contrastive_pairs",
    r"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pos AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), ranked AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 16 AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                 AS BIGINT) % 16
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ), neg AS (
      SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
             GREATEST(a.doc_id, b.doc_id) AS doc_b
      FROM ranked a JOIN ranked b
        ON a.shard = b.shard AND b.rn = a.rn + 1 AND a.rn % 2 = 1
    )
    SELECT doc_a, doc_b, 1 AS label FROM pos
    UNION ALL
    SELECT n.doc_a, n.doc_b, 0 AS label FROM neg n
    WHERE NOT EXISTS (SELECT 1 FROM pos p
                      WHERE p.doc_a = n.doc_a AND p.doc_b = n.doc_b)
    """,
)
def q_corpus_contrastive_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # Contrastive training pairs for an embedding model: positives are
    # the near-dup pairs the dedup layer already mines; negatives are
    # DETERMINISTIC random-ish pairs built shard-locally — md5-bucket
    # the corpus into 16 shards, rank within shard by md5 (a stable
    # permutation), pair consecutive ranks. No global sort: each
    # shard's window is corpus/16 and shards are md5-uniform, the same
    # bound as shuffle_shards. Accidental positives are anti-joined
    # out, so label 0 is guaranteed non-near-dup.
    docs = load(spark, sf, "documents")
    pos = (
        D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
        .select("doc_a", "doc_b", F.lit(1).alias("label"))
        .persist()
    )
    pos.count()  # eager: feeds the union AND the anti join
    ranked = docs.select(
        "doc_id", C.stable_bucket("doc_id", 16).alias("shard")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("shard").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        ),
    )
    a = ranked.filter(F.col("rn") % 2 == 1).select(
        "shard", F.col("rn").alias("rn_a"), F.col("doc_id").alias("id_a")
    )
    b = ranked.select("shard", F.col("rn").alias("rn_b"), F.col("doc_id").alias("id_b"))
    neg = (
        a.join(b, (a.shard == b.shard) & (b.rn_b == a.rn_a + 1))
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
        )
        .join(pos.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti")
        .select("doc_a", "doc_b", F.lit(0).alias("label"))
    )
    return pos.unionByName(neg)


@query(
    "dedup_clusters_stars",
    r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION
      SELECT doc_b AS x, doc_a AS y FROM pairs
    ), reach(x, y) AS (
      SELECT x, x FROM (SELECT DISTINCT x FROM edges)
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    )
    SELECT x AS doc_id, MIN(y) AS component_id, (x = MIN(y)) AS is_canonical
    FROM reach GROUP BY x
    """,
)
def q_dedup_clusters_stars(spark: SparkSession, sf: str) -> DataFrame:
    # Same contract as dedup_clusters (identical oracle), resolved by
    # the alternating large-star/small-star algorithm instead of
    # min-label propagation — O(log² n) rounds regardless of component
    # diameter, the variant that survives pathological chain-shaped
    # graphs at 100 TB. Driver-checked equality here proves the two
    # resolutions agree end-to-end on real data.
    docs = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    return D.connected_components_stars(pairs)


def _pagerank_ctes(iterations: int = 5, scale: int = 10**12) -> list:
    """Unrolled fixed-point PageRank replay: same integer arithmetic
    as operators.dedup.pagerank (floor division, fixed rounds), so the
    check is hash-exact, not approximate. DuckDB's `//` is floor
    division and SUM(BIGINT) widens to HUGEINT — the final CAST
    narrows back to BIGINT after the bounded `(85 * s) // 100`."""
    base = (15 * scale) // 100
    ctes = [
        r"""tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS x, b.doc_id AS y
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), edges AS (
      SELECT x, y FROM pairs UNION SELECT y, x FROM pairs
    ), deg AS (
      SELECT x, COUNT(*) AS d FROM edges GROUP BY x
    )""",
        f"r0 AS (SELECT x, d, CAST({scale} AS BIGINT) AS r FROM deg)",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""r{k} AS (
      SELECT dg.x, dg.d,
             CAST({base} + (85 * s.s) // 100 AS BIGINT) AS r
      FROM deg dg
      JOIN (SELECT e.y AS x, SUM(p.r // p.d) AS s
            FROM edges e JOIN r{k - 1} p ON e.x = p.x
            GROUP BY e.y) s ON dg.x = s.x
    )"""
        )
    return ctes


def _pagerank_oracle(iterations: int = 5, scale: int = 10**12) -> str:
    ctes = _pagerank_ctes(iterations, scale)
    joined = ",\n    ".join(ctes)
    return (
        f"WITH {joined}\n"
        f"SELECT x AS doc_id, CAST(d AS BIGINT) AS degree, r AS rank_fp\n"
        f"FROM r{iterations}"
    )


@query("dedup_graph_pagerank", _pagerank_oracle())
def q_dedup_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    # Authority scoring over the near-dup graph: the high-rank members
    # of a duplication family are its boilerplate HUBS (the template
    # many docs are near-copies of) — the right representative to
    # inspect or keep, vs connected_components' arbitrary min-id pick.
    # Fixed-point bigint arithmetic with a fixed round count makes the
    # iterative algorithm hash-exact against the unrolled-CTE oracle —
    # the same trick that made MinHash/LSH exactly checkable.
    docs = load(spark, sf, "documents")
    # persist: pagerank's symmetrizing union consumes pairs twice, and
    # the shingle-UDF candidate generation is the expensive half
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).persist()
    pairs.count()
    return D.pagerank(pairs)


@query("dedup_graph_hits", O.hits_oracle(iterations=4, threshold=0.6, plant_mod=101))
def q_dedup_graph_hits(spark: SparkSession, sf: str) -> DataFrame:
    # HITS over the DIRECTED containment (quotation) graph: hubs are
    # aggregator documents (quote many others), authorities are the
    # templates many documents carry — the role separation PageRank
    # over the undirected dup graph cannot make, and the one that
    # decides "keep the template, drop the aggregators". Planted
    # evidence per the vacuous-check rule: every 101st doc also
    # appears concatenated with its two successors under a shifted id
    # (a synthetic digest), because organic near-dup pairs are mutual
    # and would exercise only the symmetric corner. Max-normalized
    # bigint fixed-point with fixed rounds keeps the iterative
    # algorithm hash-exact against the unrolled-CTE oracle.
    docs = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    d = docs.select("doc_id", "text")
    a0 = d.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("k"), F.col("text").alias("t0")
    )
    a1 = d.select((F.col("doc_id") - 1).alias("k"), F.col("text").alias("t1"))
    a2 = d.select((F.col("doc_id") - 2).alias("k"), F.col("text").alias("t2"))
    planted = (
        a0.join(a1, "k")
        .join(a2, "k")
        .select(
            (F.col("k") + 20000000).alias("doc_id"),
            F.concat_ws(" ", "t0", "t1", "t2").alias("text"),
        )
    )
    edges = D.ngram_containment_edges(
        d.unionByName(planted), "text", "doc_id", n=3, threshold=0.6
    )
    return D.hits(edges, iterations=4)


@query(
    "dedup_incremental_bloom",
    f"""
    WITH tagged AS (
      SELECT doc_id, md5(text) AS h,
             {_HEX8} % 100 >= 80 AS incoming
      FROM (SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents)
    ),
    corpus AS (SELECT DISTINCT h FROM tagged WHERE NOT incoming)
    SELECT t.doc_id,
           (c.h IS NOT NULL) AS dup_of_corpus,
           (ROW_NUMBER() OVER (PARTITION BY t.h ORDER BY t.doc_id) > 1)
             AS dup_in_batch
    FROM tagged t LEFT JOIN corpus c ON t.h = c.h
    WHERE t.incoming
    """,
)
def q_dedup_incremental_bloom(spark: SparkSession, sf: str) -> DataFrame:
    # Bloom-pre-filtered incremental dedup: identical contract AND
    # identical result to dedup_incremental (same oracle — the exact
    # verify join removes every bloom false positive), but the
    # batch-vs-corpus join carries only "maybe" rows. At 100 TB the
    # corpus-hash index is read once into a broadcastable bitmap and
    # the expensive shuffle join shrinks to true-dups + FP residue —
    # the standard big-join shrinker Spark's own runtime bloom filters
    # apply, here surfaced as an operator the pipeline controls.
    docs = load(spark, sf, "documents").withColumn(
        "bucket", C.stable_bucket("doc_id", 100)
    )
    tagged = docs.select(
        "doc_id", F.md5("text").alias("h"), (F.col("bucket") >= 80).alias("incoming")
    )
    corpus = tagged.filter(~F.col("incoming")).select("h").distinct()
    batch = tagged.filter(F.col("incoming")).select("doc_id", "h")
    return D.bloom_incremental_flags(corpus, batch, "h", "doc_id")


@query(
    "dedup_incremental_bloom_sharded",
    f"""
    WITH tagged AS (
      SELECT doc_id, md5(text) AS h,
             {_HEX8} % 100 >= 80 AS incoming
      FROM (SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents)
    ),
    corpus AS (SELECT DISTINCT h FROM tagged WHERE NOT incoming)
    SELECT t.doc_id,
           (c.h IS NOT NULL) AS dup_of_corpus,
           (ROW_NUMBER() OVER (PARTITION BY t.h ORDER BY t.doc_id) > 1)
             AS dup_in_batch
    FROM tagged t LEFT JOIN corpus c ON t.h = c.h
    WHERE t.incoming
    """,
)
def q_dedup_incremental_bloom_sharded(spark: SparkSession, sf: str) -> DataFrame:
    # The ≥1e9-member bloom regime: per-shard bitmaps stay DISTRIBUTED
    # (no bitmap ever reaches the driver — the round-3 verdict's
    # driver-OOM hazard), the batch probes them through a shard-keyed
    # cogroup, and the exact verify join erases every false positive —
    # so the oracle is the same exact SQL as the plain-join variant.
    docs = load(spark, sf, "documents").withColumn(
        "bucket", C.stable_bucket("doc_id", 100)
    )
    tagged = docs.select(
        "doc_id", F.md5("text").alias("h"), (F.col("bucket") >= 80).alias("incoming")
    )
    corpus = tagged.filter(~F.col("incoming")).select("h").distinct()
    batch = tagged.filter(F.col("incoming")).select("doc_id", "h")
    return D.bloom_incremental_flags_sharded(
        corpus, batch, "h", "doc_id", n_shards=64, m_bits_per_shard=1 << 11
    )


@query("corpus_bpe_merges", O.bpe_merges_oracle(rounds=6))
def q_corpus_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    # Tokenizer training on the corpus: 6 rounds of BPE merge
    # learning over the distinct-word frequency table. Iterative with
    # a driver-side argmax (one row/round — the algorithm's inherent
    # sequential step); everything heavy (word table, per-round pair
    # stats) is distributed. The oracle replays all six rounds in one
    # recursive-CTE SQL statement, so even tokenizer TRAINING is
    # hash-exact checked, not eyeballed.
    docs = load(spark, sf, "documents")
    return C.bpe_learn_merges(docs, "text", rounds=6)


@query("corpus_bpe_encode", O.bpe_encoded_words_oracle(rounds=6))
def q_corpus_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    # The trained tokenizer's OUTPUT side: each vocabulary word's
    # subword segmentation after all 6 learned merges (word, freq,
    # pos, sym). Encoding a corpus is then a broadcast join of this
    # table onto the token stream — the word table is
    # vocabulary-bounded, so the corpus itself never re-runs the
    # merge loop. Oracle shares the training replay plus the final
    # application round.
    docs = load(spark, sf, "documents")
    return C.bpe_encoded_words(docs, "text", rounds=6)


from hadoopxmlextractor_spark.queries import ORACLE as _ORACLE


@query("corpus_pipeline_from_config", _ORACLE["corpus_prepare_training_data"])
def q_corpus_pipeline_from_config(spark: SparkSession, sf: str) -> DataFrame:
    # The same flagship corpus-prep job DECLARED as a config instead of
    # hand-composed code — the reference's config-driven UX
    # (scripts/run.sh + Hadoop XML) applied to the relational surface.
    # compile_pipeline validates the spec up front and emits ONE lazy
    # plan, so this query shares corpus_prepare_training_data's oracle
    # verbatim: the config layer must add nothing and lose nothing.
    from hadoopxmlextractor_spark.pipeline_config import compile_pipeline

    return compile_pipeline(
        spark,
        sf,
        {
            "source": "documents",
            "stages": [
                {"op": "quality_filter"},
                {"op": "dedup_exact"},
                {"op": "decontaminate", "params": {"bench_pct": 5, "min_shared": 10}},
                {"op": "pack_sequences", "params": {"capacity": 256, "n_shards": 32}},
            ],
        },
    )


@query(
    "corpus_data_contract",
    """
    WITH v AS (
      SELECT
        SUM(CASE WHEN doc_id IS NOT NULL THEN 0 ELSE 1 END) AS doc_id_not_null,
        SUM(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END) AS text_not_null,
        SUM(CASE WHEN COALESCE(n_chars = length(text), FALSE)
                 THEN 0 ELSE 1 END) AS n_chars_consistent,
        SUM(CASE WHEN COALESCE(lang IN ('en', 'de', 'fr'), FALSE)
                 THEN 0 ELSE 1 END) AS lang_in_domain,
        SUM(CASE WHEN COALESCE(source LIKE 'src%', FALSE)
                 THEN 0 ELSE 1 END) AS source_format,
        COUNT(doc_id) - COUNT(DISTINCT doc_id) AS unique_doc_id
      FROM documents
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM (
      SELECT 'doc_id_not_null' AS rule, doc_id_not_null AS n_violations FROM v
      UNION ALL SELECT 'text_not_null', text_not_null FROM v
      UNION ALL SELECT 'n_chars_consistent', n_chars_consistent FROM v
      UNION ALL SELECT 'lang_in_domain', lang_in_domain FROM v
      UNION ALL SELECT 'source_format', source_format FROM v
      UNION ALL SELECT 'unique_doc_id', unique_doc_id FROM v
    )
    """,
)
def q_corpus_data_contract(spark: SparkSession, sf: str) -> DataFrame:
    # The pre-publish quality gate: declarative expectations (nulls,
    # cross-column consistency, domain membership, key uniqueness)
    # verdicted in ONE aggregate pass over the corpus — N rules never
    # cost N scans. Null-hostile: an unevaluable expectation counts as
    # a violation.
    from hadoopxmlextractor_spark.operators.contracts import check_contract

    docs = load(spark, sf, "documents")
    return check_contract(
        docs,
        [
            ("doc_id_not_null", F.col("doc_id").isNotNull()),
            ("text_not_null", F.col("text").isNotNull()),
            ("n_chars_consistent", F.col("n_chars") == F.length("text")),
            ("lang_in_domain", F.col("lang").isin("en", "de", "fr")),
            ("source_format", F.col("source").startswith("src")),
        ],
        unique_key="doc_id",
    )


@query(
    "corpus_concentration",
    r"""
    WITH toks AS (
      SELECT source, doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT source, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_tokens DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n_docs
      FROM toks
    )
    SELECT source,
           CAST(MAX(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN rk <= GREATEST(n_docs // 10, 1)
                         THEN n_tokens ELSE 0 END) AS BIGINT)
             AS top_decile_tokens,
           ROUND(CAST(SUM(CASE WHEN rk <= GREATEST(n_docs // 10, 1)
                              THEN n_tokens ELSE 0 END) AS DOUBLE)
                 / GREATEST(SUM(n_tokens), 1), 4) AS top_decile_share
    FROM ranked GROUP BY source
    """,
)
def q_corpus_concentration(spark: SparkSession, sf: str) -> DataFrame:
    # Heavy-tail diagnostics per source: what share of the token
    # budget do the largest 10% of documents hold? The answer drives
    # chunking and sampling policy (a source where 10% of docs carry
    # 60% of tokens needs length capping before mixture weighting).
    # Count-rank decile (floor(n/10), min 1) keeps the boundary
    # integer-defined; one source-keyed exchange carries the rank
    # window and the aggregate.
    from hadoopxmlextractor_spark.operators.text import token_count

    toks = load(spark, sf, "documents").select(
        "source", "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    ranked = toks.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_docs"),
    )
    top = F.when(
        F.col("rk") <= F.greatest(F.expr("n_docs div 10"), F.lit(1)), F.col("n_tokens")
    ).otherwise(0)
    return ranked.groupBy("source").agg(
        F.max("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(top).cast("bigint").alias("top_decile_tokens"),
        F.round(
            F.sum(top).cast("double") / F.greatest(F.sum("n_tokens"), F.lit(1)), 4
        ).alias("top_decile_share"),
    )


def _survivors_authority_oracle(iterations: int = 5, scale: int = 10**12) -> str:
    """Compose the PageRank replay with component reachability: the
    kept set = every singleton plus each component's max-authority
    member ((rank_fp DESC, doc_id ASC) argmax)."""
    ctes = _pagerank_ctes(iterations, scale)
    joined = ",\n    ".join(ctes)
    return f"""WITH RECURSIVE {joined},
    reach(x, y) AS (
      SELECT x, x FROM (SELECT DISTINCT x FROM edges)
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    ),
    comp AS (
      SELECT x AS doc_id, MIN(y) AS component_id FROM reach GROUP BY x
    ),
    canon AS (
      SELECT doc_id FROM (
        SELECT c.doc_id,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY p.r DESC, c.doc_id) AS rk
        FROM comp c JOIN r{iterations} p ON c.doc_id = p.x
      ) WHERE rk = 1
    )
    SELECT d.doc_id, 'singleton' AS reason
    FROM documents d LEFT JOIN comp USING (doc_id)
    WHERE comp.doc_id IS NULL
    UNION ALL
    SELECT doc_id, 'authority' AS reason FROM canon"""


@query("dedup_survivors_authority", _survivors_authority_oracle())
def q_dedup_survivors_authority(spark: SparkSession, sf: str) -> DataFrame:
    # Authority-aware corpus filtering — PageRank made FUNCTIONAL in
    # the dedup pipeline: instead of connected_components' arbitrary
    # min-id canonical, each duplication family keeps its highest-
    # PageRank member (the template the family copies, usually the
    # most complete instance). Pairs are computed once and persisted
    # (both the component and rank branches consume them); the argmax
    # is a component-keyed window over the graph-sized join.
    docs = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).persist()
    pairs.count()  # eager: feeds both components and pagerank
    comp = D.connected_components(pairs).select("doc_id", "component_id")
    pr = D.pagerank(pairs).select("doc_id", "rank_fp")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("rank_fp"), F.asc("doc_id")
    )
    canon = (
        comp.join(pr, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.lit("authority").alias("reason"))
    )
    singles = docs.join(comp.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.lit("singleton").alias("reason")
    )
    return singles.unionByName(canon)


@query(
    "corpus_dedup_report",
    r"""
    WITH tok AS (
      SELECT doc_id, source, md5(text) AS h,
             regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    exact AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) > 1
               AS exact_dup
      FROM tok
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ),
    near AS (
      -- r14: shared-shingle candidate join (see the pairs CTEs)
      SELECT DISTINCT doc_id FROM (
        SELECT unnest([a.doc_id, b.doc_id]) AS doc_id
        FROM (
          SELECT i1.doc_id AS _da, i2.doc_id AS _db,
                 COUNT(*) AS _shared
          FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
          JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
            ON i1.s = i2.s AND i1.doc_id < i2.doc_id
          GROUP BY 1, 2
        ) _cand
        JOIN sh a ON a.doc_id = _cand._da
        JOIN sh b ON b.doc_id = _cand._db
        WHERE CAST(_cand._shared AS DOUBLE)
              / (len(a.shingles) + len(b.shingles) - _cand._shared)
              >= 0.5
      )
    )
    SELECT e.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN e.exact_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_dups,
           CAST(SUM(CASE WHEN n.doc_id IS NOT NULL AND NOT e.exact_dup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dups,
           ROUND(CAST(SUM(CASE WHEN e.exact_dup OR n.doc_id IS NOT NULL
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS dup_rate
    FROM exact e LEFT JOIN near n USING (doc_id)
    GROUP BY e.source
    """,
)
def q_corpus_dedup_report(spark: SparkSession, sf: str) -> DataFrame:
    # The dedup IMPACT report per source — the dashboard number a data
    # team watches batch over batch: docs, exact-dup count (non-first
    # occurrences), additional near-dup members (n-gram Jaccard >= 0.5,
    # excluding docs already exact-dup), and the combined dup rate.
    # Exact flags ride one md5-keyed window; near membership reuses the
    # inverted-index candidate join; the final rollup is
    # dimension-sized.
    docs = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = docs.select(
        "doc_id", "source", (F.row_number().over(w) > 1).alias("exact_dup")
    )
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    near = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("near", F.lit(True))
    )
    return (
        exact.join(near, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("exact_dup"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_dups"),
            F.sum(
                F.when(F.col("near").isNotNull() & ~F.col("exact_dup"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_near_dups"),
            F.round(
                F.sum(
                    F.when(F.col("exact_dup") | F.col("near").isNotNull(), 1).otherwise(
                        0
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("dup_rate"),
        )
    )


@query(
    "corpus_soft_quality_sample",
    rf"""
    WITH sig AS (
      SELECT doc_id,
             n_tokens,
             ROUND(n_distinct / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 4)
               AS distinct_ratio,
             ROUND((n_chars - n_tokens + 1)
                   / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 4)
               AS mean_token_len
      FROM (
        SELECT doc_id,
               length(text) AS n_chars,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               len(list_distinct(
                 regexp_split_to_array(trim(lower(text)), '\s+'))) AS n_distinct
        FROM documents
      )
    ),
    scored AS (
      SELECT doc_id,
             CASE WHEN n_tokens >= 40 AND n_tokens <= 5000
                       AND distinct_ratio >= 0.35 AND mean_token_len <= 8.0
                  THEN 10000 ELSE 2500 END AS p_bp,
             md5('sq:' || CAST(doc_id AS VARCHAR)) AS hh
      FROM sig
    )
    SELECT doc_id, CAST(p_bp AS BIGINT) AS p_bp,
           ({_HEX8} % 10000) < p_bp AS keep
    FROM scored
    """,
)
def q_corpus_soft_quality_sample(spark: SparkSession, sf: str) -> DataFrame:
    # SOFT quality filtering (the CCNet head/middle/tail idea reduced
    # to two tiers): documents passing the heuristics always survive,
    # rejected ones survive at 25% — keeping distributional coverage
    # of the tail instead of amputating it. The coin is the md5 bucket
    # of the doc id (deterministic, engine-replayable, independent of
    # the quality hash), so re-runs keep the exact same rows. Pure
    # projection over one scan — no shuffle at all.
    docs = load(spark, sf, "documents")
    verdict = C.quality_filter(docs, "text", "doc_id")
    h = F.md5(F.concat(F.lit("sq:"), F.col("doc_id").cast("string")))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 10000
    p = F.when(F.col("keep"), 10000).otherwise(2500)
    return verdict.select(
        "doc_id",
        p.cast("bigint").alias("p_bp"),
        (bucket < p).alias("keep"),
    )


@query(
    "corpus_semantic_leakage",
    O.semantic_leakage_oracle(
        threshold=0.45, dim=64, n_planes=4, n_tables=8, val_pct=10
    ),
)
def q_corpus_semantic_leakage(spark: SparkSession, sf: str) -> DataFrame:
    # Semantic train/val leakage audit: text decontamination
    # (corpus_decontaminate) misses paraphrases, so eval hygiene at
    # scale also needs the EMBEDDING-space check — near-dup pairs
    # (seeded LSH buckets, never O(n²)) that straddle the stable
    # md5-bucket split, oriented train-side first. Both building
    # blocks are the production ops; the audit is their join.
    emb = load(spark, sf, "embeddings")
    pairs = S.cosine_pairs_lsh(emb, threshold=0.45, dim=64, n_planes=4, n_tables=8)
    split = C.train_val_split(
        load(spark, sf, "documents").select("doc_id"), "doc_id"
    ).select("doc_id", "split")
    sa = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            F.when(F.col("split_a") == "train", F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("train_id"),
            F.when(F.col("split_a") == "train", F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("val_id"),
            "sim",
        )
    )


@query(
    "corpus_line_filter",
    r"""
    WITH seg AS (
      SELECT doc_id,
             [s FOR s IN string_split(text, '. ')
                IF len(regexp_split_to_array(trim(s), '\s+')) >= 3
                   AND trim(s) <> ''] AS kept,
             len(string_split(text, '. ')) AS n_segments
      FROM documents
    )
    SELECT doc_id,
           CAST(n_segments AS BIGINT) AS n_segments,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(length(array_to_string(kept, '. ')) AS BIGINT) AS kept_len
    FROM seg
    """,
)
def q_corpus_line_filter(spark: SparkSession, sf: str) -> DataFrame:
    # RefinedWeb/C4-style FINE-GRAINED filtering: documents are
    # salvaged line-by-line (drop segments under 3 words) instead of
    # dropped whole — the step that rescues mostly-good documents with
    # boilerplate stuck in them. Pure JVM array expressions at scan
    # bandwidth, zero shuffle; the HOFs sit in a top-level projection
    # (never under a join, per the interpreted-lambda rule).
    docs = load(spark, sf, "documents")
    segs = F.split(F.col("text"), r"\. ")
    kept = F.filter(
        segs,
        lambda s: (F.size(F.split(F.trim(s), r"\s+")) >= 3) & (F.trim(s) != ""),
    )
    return docs.select(
        "doc_id",
        F.size(segs).cast("bigint").alias("n_segments"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.length(F.array_join(kept, ". ")).cast("bigint").alias("kept_len"),
    )


@query(
    "corpus_leakage_free_split",
    r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM tok
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (
        -- r14: the shared-shingle inverted index yields |A∩B|
        -- directly (shingle lists are list_distinct, so the posting
        -- join counts the intersection exactly) — replaces the
        -- all-pairs cross join + per-pair list_intersect that made
        -- this oracle quadratic and unusable at the sf0.1 gate
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db
      WHERE CAST(_cand._shared AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - _cand._shared)
            >= 0.5
    ), edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION
      SELECT doc_b AS x, doc_a AS y FROM pairs
    ), reach(x, y) AS (
      SELECT x, x FROM (SELECT DISTINCT x FROM edges)
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    ), comp AS (
      SELECT x AS doc_id, MIN(y) AS component_id FROM reach GROUP BY x
    ), clustered AS (
      SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN CAST(('0x' || substring(md5(CAST(cluster_id AS VARCHAR)),
                                             1, 8)) AS BIGINT) % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM clustered
    """,
)
def q_corpus_leakage_free_split(spark: SparkSession, sf: str) -> DataFrame:
    # The FIX for what corpus_semantic_leakage audits: split by
    # near-dup CLUSTER, not by document, so a duplication family can
    # never straddle the train/val boundary. Singletons cluster as
    # themselves; the split is the same stable md5 bucket, keyed on
    # the cluster's canonical id. Components ride the existing
    # min-label propagation; the extra cost over a plain split is the
    # near-dup graph we already build for dedup.
    docs = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    comp = D.connected_components(pairs).select("doc_id", "component_id")
    clustered = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("cluster_id"),
        )
    )
    return clustered.select(
        "doc_id",
        "cluster_id",
        F.when(C.stable_bucket("cluster_id", 100) < 90, "train")
        .otherwise("val")
        .alias("split"),
    )


@query(
    "corpus_token_budget_plan",
    r"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS tok,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), c AS (
      SELECT source, doc_id, tok,
             COALESCE(SUM(tok) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs_taken,
           CAST(SUM(tok) AS BIGINT) AS tokens_taken
    FROM c WHERE cum_prev < 800
    GROUP BY source
    """,
)
def q_corpus_token_budget_plan(spark: SparkSession, sf: str) -> DataFrame:
    # Training-mix construction against a token budget: fill each
    # source greedily in the stable md5 order until its budget is
    # reached (the crossing doc is included, so every source lands
    # within one document of its budget — deterministic, re-runnable,
    # and incremental-load stable). One source-keyed exchange shared
    # by the window and the rollup.
    ev = load(spark, sf, "documents")
    t = ev.select(
        "source",
        "doc_id",
        T.token_count(F.col("text")).cast("bigint").alias("tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    c = t.withColumn("cum_prev", F.coalesce(F.sum("tok").over(prev), F.lit(0)))
    return (
        c.filter(F.col("cum_prev") < 800)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_taken"),
            F.sum("tok").alias("tokens_taken"),
        )
    )


@query(
    "corpus_hard_negatives",
    f"""
    WITH p AS MATERIALIZED ({{pairs}})
    SELECT id_a, id_b, sim FROM p WHERE sim < 0.45
    """.format(pairs=O.near_pairs_lsh_oracle(
        threshold=0.2, dim=64, n_planes=4, n_tables=8
    )),
)
def q_corpus_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    # Hard-negative mining for contrastive/embedding training: pairs
    # that LOOK similar enough to collide in the LSH buckets but fall
    # below the near-dup threshold — the semantically-adjacent
    # non-duplicates that teach a retriever its decision boundary
    # (random negatives, corpus_contrastive_pairs, are too easy).
    # Same bucketed candidate generation as dedup, different band.
    emb = load(spark, sf, "embeddings")
    pairs = S.cosine_pairs_lsh(
        emb, threshold=0.2, dim=64, n_planes=4, n_tables=8
    )
    return pairs.filter(F.col("sim") < 0.45)


@query(
    "corpus_chunk_language",
    r"""
    WITH base AS (
      SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, lang, w, n_tokens,
             unnest(generate_series(
               0, GREATEST(CAST(CEIL(n_tokens / 32.0) AS BIGINT), 1) - 1
             )) AS chunk_idx
      FROM base
    ), ct AS (
      SELECT doc_id, lang, CAST(chunk_idx AS INT) AS chunk_idx,
             ' ' || lower(CASE WHEN n_tokens = 0 THEN ''
               ELSE array_to_string(
                 w[chunk_idx * 32 + 1 : LEAST((chunk_idx + 1) * 32, n_tokens)],
                 ' ') END) || ' ' AS p
      FROM c
    ), scored AS (
      SELECT doc_id, chunk_idx, lang AS declared_lang,
             (length(p) - length(replace(p, ' the ', ''))) / 5.0
           + (length(p) - length(replace(p, ' and ', ''))) / 5.0
           + (length(p) - length(replace(p, ' of ', ''))) / 4.0 AS s_en,
             (length(p) - length(replace(p, ' der ', ''))) / 5.0
           + (length(p) - length(replace(p, ' und ', ''))) / 5.0
           + (length(p) - length(replace(p, ' die ', ''))) / 5.0 AS s_de,
             (length(p) - length(replace(p, ' le ', ''))) / 4.0
           + (length(p) - length(replace(p, ' et ', ''))) / 4.0
           + (length(p) - length(replace(p, ' les ', ''))) / 5.0 AS s_fr
      FROM ct
    )
    SELECT doc_id, chunk_idx, declared_lang,
           CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_fr THEN 'de'
                WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                ELSE 'unknown' END AS detected_lang
    FROM scored
    """,
)
def q_corpus_chunk_language(spark: SparkSession, sf: str) -> DataFrame:
    # Mixed-language document segmentation: language-ID per 32-token
    # chunk instead of per document — the pass that finds embedded
    # foreign-language boilerplate a doc-level ID averages away. Pure
    # composition of the chunker and the marker heuristic: still one
    # zero-shuffle codegen projection per chunk row.
    docs = load(spark, sf, "documents")
    chunks = C.chunk_text(docs.select("doc_id", "lang", "text"), "text", "doc_id",
                          chunk_tokens=32, carry=("lang",))
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.col("lang").alias("declared_lang"),
        T.language_id("chunk_text").alias("detected_lang"),
    )


@query(
    "corpus_dsir_sample",
    f"""
    WITH tok AS (
      SELECT doc_id, (lang = 'en') AS is_t,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ), bk AS MATERIALIZED (
      SELECT doc_id, is_t, {_HEX8} % 4096 AS bkt
      FROM (SELECT doc_id, is_t, md5(token) AS hh FROM tok)
    ), stats AS (
      SELECT bkt, CAST(COUNT(*) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct
      FROM bk GROUP BY bkt
    ), w AS (
      SELECT bkt, (ct * 10000) // cr AS wt FROM stats
    ), scores AS (
      SELECT bk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w.wt) AS BIGINT) AS score
      FROM bk JOIN w USING (bkt) GROUP BY bk.doc_id
    )
    SELECT doc_id, n_tokens, score, score // n_tokens AS avg_weight
    FROM scores ORDER BY score DESC, doc_id LIMIT 200
    """,
)
def q_corpus_dsir_sample(spark: SparkSession, sf: str) -> DataFrame:
    # DSIR data selection (Xie et al. 2023): hashed-unigram importance
    # weights fit on the en-language subset as the target distribution,
    # every doc scored by integer-exact scaled likelihood ratios, top
    # 200 kept (TakeOrderedAndProject — fixed-K at any corpus size).
    # Floor division is non-negative on both engines (Spark `div`,
    # DuckDB `//` — the count-rank boundary rule).
    docs = (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .withColumn("is_target", (F.col("lang") == "en"))
    )
    from hadoopxmlextractor_spark.operators.corpus import dsir_importance_weights

    scored = dsir_importance_weights(
        docs, "text", "doc_id", "is_target", dim=4096, scale=10000
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(200)


@query(
    "embedding_bitext_mine",
    O.bitext_mutual_oracle(threshold=0.3, dim=64, n_planes=8, n_tables=8),
)
def q_embedding_bitext_mine(spark: SparkSession, sf: str) -> DataFrame:
    # Bitext mining (Artetxe & Schwenk 2019): treat even/odd vec_ids as
    # two languages in a shared embedding space and mine translation
    # pairs as mutual-top-1 cross-side matches with runner-up margins.
    # Candidates ride the seeded banded-LSH generator (never O(n²));
    # mutual-best pairs provably exist whenever any cross-side
    # candidate does (the globally best pair is mutual), so the result
    # is organically non-vacuous at every SF.
    emb = load(spark, sf, "embeddings")
    # 8-bit bands (256 buckets/table), not the near-pair default of 4:
    # translation pairs sit at sim→1 where 8-bit recall is still ~1-3e-6,
    # and the finer buckets keep candidate counts sub-quadratic as the
    # corpus grows (measured: 4-bit buckets stop discriminating by 20k
    # vectors and the candidate join goes quadratic — SCALE.md).
    # r14-opt (guide §3.2/§4.4): the cross-parity predicate used to
    # ride filter-pushdown into the LSH join condition; the cosine
    # kernel's nondeterministic marker blocks that push, so state it
    # structurally — same-side pairs (which bitext_mutual_top1 discards
    # unconditionally) never reach the pair-dedup or the verify kernel.
    pairs = S.cosine_pairs_lsh(
        emb, threshold=0.3, dim=64, n_planes=8, n_tables=8,
        pair_filter=lambda a, b: ((a % 2) == 0) != ((b % 2) == 0),
    )
    return S.bitext_mutual_top1(pairs, parity_mod=2)


@query(
    "corpus_shard_manifest",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             {_HEX8} % 16 AS shard
      FROM (SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS hh
            FROM documents WHERE text IS NOT NULL)
    ),
    c AS (
      SELECT doc_id, shard,
             CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS content_h,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM t
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           bit_xor(content_h) AS checksum,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM c GROUP BY shard
    """,
)
def q_corpus_shard_manifest(spark: SparkSession, sf: str) -> DataFrame:
    # Shard-manifest integrity ledger: the sidecar a reproducible
    # training loader checks before reading a shard — row count,
    # order-independent content checksum (XOR of per-doc md5-derived
    # hashes: commutative, so partitioning and task order can't change
    # it), char volume, id range. One uniform-key aggregate at scan
    # bandwidth; verifying a re-export equals comparing 16 manifest
    # rows instead of re-reading the corpus.
    docs = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 16
    )
    content_h = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    return (
        docs.select(
            "doc_id",
            shard.cast("int").alias("shard"),
            content_h.alias("content_h"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.bit_xor("content_h").alias("checksum"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@query(
    "corpus_source_divergence",
    f"""
    WITH tok AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ), bk AS MATERIALIZED (
      SELECT source, {_HEX8} % 1024 AS bkt
      FROM (SELECT source, md5(token) AS hh FROM tok)
    ), cnt AS (
      SELECT source, bkt, CAST(COUNT(*) AS BIGINT) AS c FROM bk GROUP BY 1, 2
    ), n AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM bk GROUP BY 1
    ), f AS MATERIALIZED (
      SELECT cnt.source, cnt.bkt, (c * 1000000) // n.n AS fq
      FROM cnt JOIN n USING (source)
    ), d AS MATERIALIZED (
      SELECT g.source, g.bkt, COALESCE(f.fq, 0) AS fq
      FROM (SELECT s.source, b.bkt
            FROM (SELECT DISTINCT source FROM f) s
            CROSS JOIN (SELECT DISTINCT bkt FROM f) b) g
      LEFT JOIN f ON f.source = g.source AND f.bkt = g.bkt
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(SUM(abs(a.fq - b.fq)) AS BIGINT) AS l1_scaled
    FROM d a JOIN d b ON a.bkt = b.bkt AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def q_corpus_source_divergence(spark: SparkSession, sf: str) -> DataFrame:
    # Source-redundancy matrix: scaled-integer L1 distance between each
    # source pair's hashed-unigram distributions — the curation signal
    # for "which sources say the same things" when planning mixtures.
    # The corpus collapses to a (sources x 1024-bucket) table in one
    # uniform-key aggregate; everything after is dimension-sized (the
    # densify cross join is 20x1024 rows, the pair join S^2 x buckets),
    # so the matrix costs one corpus pass at any scale. Integer floor
    # division (non-negative) replaces float frequencies for exact
    # cross-engine replay.
    from hadoopxmlextractor_spark.operators.corpus import stable_bucket

    docs = load(spark, sf, "documents").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    tok = docs.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("token")
    ).withColumn("bkt", stable_bucket("token", 1024))
    cnt = tok.groupBy("source", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).persist()
    cnt.count()  # eager: feeds both the per-source totals and f
    # per-source totals derive from the dimension-sized cnt table —
    # never a second corpus scan (the "one corpus pass" claim is real)
    n = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    f = cnt.join(n, "source").select(
        "source", "bkt", F.expr("(c * 1000000) div n").alias("fq")
    ).persist()
    f.count()  # eager: feeds the grid (twice) and the dense table
    grid = (
        f.select("source")
        .distinct()
        .crossJoin(f.select("bkt").distinct())
    )
    d = (
        grid.join(f, ["source", "bkt"], "left")
        .select("source", "bkt", F.coalesce("fq", F.lit(0)).alias("fq"))
        .persist()
    )
    d.count()  # eager: both join sides read it
    a = d.select(
        F.col("source").alias("source_a"), "bkt", F.col("fq").alias("fa")
    )
    b = d.select(
        F.col("source").alias("source_b"),
        F.col("bkt").alias("bkt_b"),
        F.col("fq").alias("fb"),
    )
    out = (
        a.join(
            b,
            (F.col("bkt") == F.col("bkt_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.abs(F.col("fa") - F.col("fb"))).cast("long").alias("l1_scaled"))
        .localCheckpoint(eager=True)
    )
    f.unpersist()
    d.unpersist()
    cnt.unpersist()
    return out


@query(
    "governance_forget_audit",
    """
    WITH uni AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 3000000 AS doc_id, text FROM documents
      WHERE doc_id % 50 = 0
    ),
    hashed AS (SELECT doc_id AS cid, md5(text) AS h
               FROM uni WHERE text IS NOT NULL),
    rids AS (SELECT DISTINCT doc_id AS rid FROM documents WHERE doc_id % 50 = 0),
    req AS (SELECT cid AS doc_id, h FROM hashed JOIN rids ON cid = rid),
    surv AS (SELECT h FROM hashed WHERE cid NOT IN (SELECT rid FROM rids))
    SELECT r.doc_id, CAST(COUNT(s.h) AS BIGINT) AS n_exact_residuals
    FROM req r LEFT JOIN surv s ON r.h = s.h
    GROUP BY r.doc_id
    """,
)
def q_governance_forget_audit(spark: SparkSession, sf: str) -> DataFrame:
    # Right-to-be-forgotten propagation audit: every 50th doc files a
    # takedown, and PLANTED mirror copies (same text re-landed under
    # id+3M — the re-crawl an id-based delete misses) must surface as
    # non-zero residual counts per the vacuous-check rule; organic
    # exact dups in the synthetic corpus add to them.
    from hadoopxmlextractor_spark.operators import contracts as G

    docs = load(spark, sf, "documents")
    mirrors = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    uni = docs.select("doc_id", "text").unionByName(mirrors)
    removal = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id")
    return G.forget_residual_audit(uni, removal, "text", "doc_id")


@query(
    "corpus_curriculum_order",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    probs AS (
      SELECT tok,
             CAST(c AS DOUBLE) / (SELECT CAST(SUM(c) AS DOUBLE) FROM vocab)
               AS p
      FROM vocab
    ),
    scored AS (
      SELECT doc_id,
             CAST(ROUND(ROUND(-AVG(ln(p)), 6) * 1000000) AS BIGINT)
               AS score_micro
      FROM toks JOIN probs USING (tok)
      GROUP BY doc_id
    ),
    bounds AS (
      SELECT quantile_cont(score_micro, 0.25) AS q0,
             quantile_cont(score_micro, 0.50) AS q1,
             quantile_cont(score_micro, 0.75) AS q2
      FROM scored
    )
    SELECT doc_id,
           CAST((score_micro > q0)::INT + (score_micro > q1)::INT
                + (score_micro > q2)::INT AS INT) AS stage,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY (score_micro > q0)::INT + (score_micro > q1)::INT
                          + (score_micro > q2)::INT
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS BIGINT) AS pos_in_stage,
           score_micro
    FROM scored, bounds
    """,
)
def q_corpus_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    # Curriculum staging (easy -> hard by the unigram perplexity
    # proxy): exact integer micro-nat scores, stage boundaries from one
    # dyadic-percentile aggregate broadcast back (never a global-sort
    # NTILE), md5-keyed rank WITHIN each stage (stage-local shuffle,
    # never a global rank). Double-round before the BIGINT cast: Spark
    # CAST truncates doubles where DuckDB rounds.
    docs = load(spark, sf, "documents")
    return C.curriculum_stages(docs, "text", "doc_id")


@query(
    "corpus_priority_sample",
    """
    WITH keyed AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) AS w,
             (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) * 1048576) // CAST(n_chars AS BIGINT) AS pkey
      FROM documents
    ),
    cand AS (SELECT * FROM keyed ORDER BY pkey, doc_id LIMIT 51),
    ranked AS (
      SELECT doc_id, w, pkey,
             ROW_NUMBER() OVER (ORDER BY pkey, doc_id) AS rn
      FROM cand
    ),
    taued AS (
      SELECT doc_id, w, pkey, rn,
             COALESCE(MAX(CASE WHEN rn = 51 THEN pkey END) OVER (), -1)
               AS tau_key
      FROM ranked
    )
    SELECT doc_id, w, pkey, tau_key,
           CAST(CASE WHEN tau_key < 0 THEN w
                ELSE GREATEST(w, 4503599627370496 // (tau_key + 1))
                END AS BIGINT) AS est
    FROM taued
    WHERE rn <= 50
    """,
)
def q_corpus_priority_sample(spark: SparkSession, sf: str) -> DataFrame:
    # Priority sampling (Duffield-Lund-Thorup): a 50-doc subsample
    # weighted by n_chars whose per-row `est` column sums to an
    # estimate of total corpus chars - unbiased subset-sum estimation
    # from a fixed-size sample, which uniform sampling cannot give.
    # Priorities are exact INTEGER keys (md5-u * 2^20 div w): ordering
    # is engine-identical bigint comparison, never a float rank.
    # One ordered LIMIT (TakeOrderedAndProject), k+1-row everything
    # after - the 100 TB shape.
    docs = load(spark, sf, "documents")
    return C.priority_sample(docs, "doc_id", "n_chars", k=50)


@query(
    "corpus_epoch_shuffle",
    """
    WITH idx AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS x
      FROM documents
    ),
    ep AS (SELECT 0 AS epoch UNION ALL SELECT 1),
    f0 AS (
      SELECT doc_id, epoch, x // 1024 AS l0, x % 1024 AS r0
      FROM idx CROSS JOIN ep
    ),
    f1 AS (
      SELECT doc_id, epoch, r0 AS l1,
             xor(l0, ((r0 + 1) * 2654435761 + (epoch + 1) * 8) % 1024) AS r1
      FROM f0
    ),
    f2 AS (
      SELECT doc_id, epoch, r1 AS l2,
             xor(l1, ((r1 + 1) * 2246822519 + (epoch + 1) * 8) % 1024) AS r2
      FROM f1
    ),
    f3 AS (
      SELECT doc_id, epoch, r2 AS l3,
             xor(l2, ((r2 + 1) * 3266489917 + (epoch + 1) * 8) % 1024) AS r3
      FROM f2
    )
    SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
           CAST(l3 * 1024 + r3 AS BIGINT) AS slot
    FROM f3
    """,
)
def q_corpus_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    # Shuffle-free multi-epoch shuffle: per-epoch reading slots from a
    # 3-round Feistel permutation over [0, 2^20) - a pure integer
    # projection, so every epoch's re-randomization costs zero
    # shuffles/sorts/joins (ORDER BY rand() pays a global sort per
    # epoch and breaks on task retry). The dense index is derived here
    # for the synthetic table; at 100 TB it is assigned once at ingest
    # and the epoch schedule remains a map-only job. Distinct-slot
    # bijectivity is pytest-asserted; the oracle replays the exact
    # bigint add/mul/mod/xor chain.
    docs = load(spark, sf, "documents").select("doc_id")
    idx = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("doc_id")) - 1)
        .cast("long")
        .alias("idx"),
    )
    return C.epoch_slots(idx, "doc_id", "idx", epochs=2, seed=7)


@query(
    "corpus_priority_sample_grouped",
    """
    WITH relabeled AS (
      SELECT doc_id,
             CASE WHEN doc_id < 60 THEN source || '_head' ELSE source END
               AS grp,
             CAST(n_chars AS BIGINT) AS w
      FROM documents
    ),
    keyed AS (
      SELECT grp, doc_id, w,
             (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) * 1048576) // w AS pkey
      FROM relabeled
    ),
    ranked AS (
      SELECT grp, doc_id, w, pkey,
             ROW_NUMBER() OVER (
               PARTITION BY grp ORDER BY pkey, doc_id) AS rn
      FROM keyed
    ),
    capped AS (SELECT * FROM ranked WHERE rn <= 11),
    taued AS (
      SELECT grp, doc_id, w, pkey, rn,
             COALESCE(MAX(CASE WHEN rn = 11 THEN pkey END)
                        OVER (PARTITION BY grp), -1) AS tau_key
      FROM capped
    )
    SELECT grp, doc_id, w, pkey, tau_key,
           CAST(CASE WHEN tau_key < 0 THEN w
                     ELSE GREATEST(w, 4503599627370496 // (tau_key + 1))
                END AS BIGINT) AS est
    FROM taued
    WHERE rn <= 10
    """,
)
def q_corpus_priority_sample_grouped(spark: SparkSession, sf: str) -> DataFrame:
    # Per-source weighted quota sampling (k=10 per group) - the grouped
    # DLT variant: one group-keyed shuffle carrying ~(k+1)*groups rows
    # (rank<=k+1 pushes into WindowGroupLimit, plan-asserted in the
    # unit test). The doc_id<60 head relabel plants groups SMALLER than
    # k so the exhaustive branch (tau_key = -1, est = exact w) is live
    # alongside the thresholded estimator - the vacuous-check rule.
    docs = load(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") < 60, F.concat(F.col("source"), F.lit("_head")))
        .otherwise(F.col("source"))
        .alias("grp"),
        "n_chars",
    )
    return C.priority_sample_grouped(docs, "doc_id", "n_chars", "grp", k=10)


@query(
    "corpus_incremental_priority_sample",
    """
    WITH keyed AS (
      SELECT source AS grp, doc_id,
             (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) * 1048576) // CAST(n_chars AS BIGINT) AS pkey
      FROM documents
    )
    SELECT grp, doc_id, pkey, CAST(rank AS INT) AS rank FROM (
      SELECT grp, doc_id, pkey,
             ROW_NUMBER() OVER (
               PARTITION BY grp ORDER BY pkey, doc_id) AS rank
      FROM keyed)
    WHERE rank <= 11
    """,
)
def q_corpus_incremental_priority_sample(spark: SparkSession, sf: str) -> DataFrame:
    # Incremental maintenance of a standing per-source priority sample
    # (the fourth maintenance regime: bottom-(k+1) priority keys are
    # insert-only self-maintainable INCLUDING the DLT threshold
    # witness): the corpus lands as two id-parity generations, each
    # merged into the standing table via maintain_priority_sample; the
    # oracle is deliberately the from-scratch grouped sample over ALL
    # rows - the maintenance identity. Displacement across generations
    # is organic (md5 priorities are uniform, so each generation owns
    # ~half of every group's smallest keys).
    from hadoopxmlextractor_spark.snapshots import maintain_priority_sample

    docs = load(spark, sf, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    keyed = docs.select(
        F.col("source").alias("grp"),
        "doc_id",
        (u * F.lit(1048576)).alias("_scaled"),
        F.col("n_chars").cast("long").alias("w"),
    ).select("grp", "doc_id", F.expr("_scaled div w").alias("pkey"))
    gen0 = keyed.filter(F.col("doc_id") % 2 == 0)
    gen1 = keyed.filter(F.col("doc_id") % 2 == 1)
    standing = maintain_priority_sample(
        gen0.limit(0), gen0, "grp", "doc_id", "pkey", k=10
    ).drop("rank")
    merged = maintain_priority_sample(
        standing, gen1, "grp", "doc_id", "pkey", k=10
    )
    return merged.select(
        "grp", "doc_id", "pkey", F.col("rank").cast("int").alias("rank")
    )


@query(
    "corpus_unimax_budget",
    """
    WITH sizes AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sz
      FROM documents GROUP BY lang
    ),
    caps AS (
      SELECT lang, sz, sz * 3 AS cap,
             ROW_NUMBER() OVER (ORDER BY sz * 3, lang) AS j,
             COUNT(*) OVER () AS m,
             COALESCE(SUM(sz * 3) OVER (
               ORDER BY sz * 3, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix_before
      FROM sizes
    ),
    flagged AS (
      SELECT lang, sz, cap, j, m,
             prefix_before + cap * (m - j + 1) <= 320001 AS capped
      FROM caps
    ),
    agg AS (
      SELECT lang, sz, cap, capped,
             SUM(CASE WHEN capped THEN cap ELSE 0 END) OVER () AS s_capped,
             SUM(CASE WHEN capped THEN 0 ELSE 1 END) OVER () AS m_rem,
             SUM(CASE WHEN capped THEN 0 ELSE 1 END) OVER (
               ORDER BY cap, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS uncapped_rank
      FROM flagged
    ),
    alloc AS (
      SELECT lang, sz, cap, capped,
             CAST(CASE WHEN capped THEN cap
                  ELSE (320001 - s_capped) // m_rem
                       + (CASE WHEN uncapped_rank <=
                            (320001 - s_capped)
                            - ((320001 - s_capped) // m_rem) * m_rem
                          THEN 1 ELSE 0 END)
                  END AS BIGINT) AS allocated
      FROM agg
    )
    SELECT lang, sz, cap, capped, allocated,
           CAST(allocated * 10000 // sz AS BIGINT) AS epoch_bp
    FROM alloc
    """,
)
def q_corpus_unimax_budget(spark: SparkSession, sf: str) -> DataFrame:
    # UniMax (Chung et al. 2023) training-budget allocation over the
    # corpus languages: every language contributes at most 3 epochs of
    # its own data; the budget the capped tail frees waterfills
    # uniformly over the head. Budget 320001 chars against this
    # corpus's language profile keeps every branch live: 3 languages
    # capped, 2 on the uniform share, remainder +1 exercised. Exact
    # integer waterfill end-to-end (caps ascend -> capped set is a
    # prefix; share+1 provably never exceeds an uncapped cap).
    docs = load(spark, sf, "documents")
    return C.unimax_allocation(
        docs, "lang", "n_chars", budget=320_001, epoch_cap=3
    )
