import pytest
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators import dedup as D
from hadoopxmlextractor_spark.operators import similarity as S


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 distinct base docs; doc 10 is an exact copy of 0, doc 11 a
    # near-copy of 1 (one word changed), doc 12 unrelated.
    base0 = "the quick brown fox jumps over the lazy dog again and again " * 4
    base1 = "spark shuffles data between executors when joins need copartitioning " * 4
    near1 = base1.replace("executors", "workers", 1)
    rows = [
        (0, base0),
        (1, base1),
        (2, "completely different content about cooking pasta with garlic"),
        (10, base0),
        (11, near1),
        (12, "unrelated text regarding medieval castles and their defenses"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_dedup_exact(spark, corpus):
    kept = D.dedup_exact(corpus, "text", "doc_id")
    ids = {r.doc_id for r in kept.collect()}
    assert 0 in ids and 10 not in ids  # exact dup dropped, lowest id kept
    assert ids == {0, 1, 2, 11, 12}


def test_ngram_jaccard_exact_pairs(spark, corpus):
    pairs = D.ngram_jaccard_pairs(corpus, "text", "doc_id", n=3, threshold=0.5)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    assert (0, 10) in got and got[(0, 10)] == 1.0
    assert (1, 11) in got and got[(1, 11)] > 0.5
    assert all(a in {0, 1} for a, _ in got)


def test_minhash_estimates_match_truth(spark, corpus):
    pairs = D.dedup_minhash_lsh(
        corpus, "text", "doc_id", num_hashes=128, bands=32, threshold=0.5
    )
    got = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs.collect()}
    assert got[(0, 10)] == 1.0  # identical docs → identical signatures
    assert (1, 11) in got and got[(1, 11)] > 0.5  # near-dup found by LSH
    assert (0, 1) not in got


def test_minhash_hot_bucket_cap(spark):
    # 50 identical docs: bucket cap skips the degenerate bucket entirely.
    rows = [(i, "same text everywhere all the time") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = D.minhash_signatures(df, "text", "doc_id", num_hashes=16)
    capped = D.minhash_lsh_candidates(sigs, bands=4, rows_per_band=4, max_bucket=10)
    assert capped.count() == 0
    uncapped = D.minhash_lsh_candidates(sigs, bands=4, rows_per_band=4, max_bucket=None)
    assert uncapped.count() == 50 * 49 // 2


def test_simhash_near_pairs(spark, corpus):
    pairs = D.simhash_near_pairs(
        D.simhash(corpus, "text", "doc_id"), max_hamming=7
    )
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got.get((0, 10)) == 0  # identical → hamming 0
    assert (1, 11) in got  # near-dup within hamming budget
    assert (2, 12) not in got


def test_simhash_blocking_recall_guarantee(spark):
    # Planted signatures with exact hamming distances: 6 and 7 bits
    # spread across distinct 8-bit chunks (the worst case for the
    # pigeonhole blocking) MUST be found; max_hamming beyond the 8-chunk
    # guarantee (<=7) is rejected instead of silently losing recall.
    base = 0x0123456789ABCDEF
    h6 = base
    for k in range(6):  # flip one bit in each of 6 different chunks
        h6 ^= 1 << (8 * k)
    h7 = base
    for k in range(7):
        h7 ^= 1 << (8 * k)
    rows = [(0, base), (6, h6), (7, h7)]
    sim = spark.createDataFrame(rows, "doc long, simhash long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.simhash_near_pairs(sim, max_hamming=7).collect()
    }
    assert got[(0, 6)] == 6
    assert got[(0, 7)] == 7
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_near_pairs(sim, max_hamming=8)


def test_ngram_stop_shingle_cap(spark):
    # 40 docs sharing one hot shingle ("common stop phrase"): with the
    # df cap the shingle is dropped from the inverted index, so the
    # otherwise-quadratic 40*39/2 join fan-out collapses to zero pairs.
    rows = [
        (i, f"unique{i} wording{i} here{i} common stop phrase") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = D.ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.05, max_df=None
    )
    assert uncapped.count() == 40 * 39 // 2
    capped = D.ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.05, max_df=5
    )
    assert capped.count() == 0
    # auto mode (the default) derives max(1000, 1% of docs) — a no-op on
    # tiny corpora, so planted near-dups still surface.
    assert D.ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.05).count() \
        == 40 * 39 // 2


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 16).astype("float32")
    base[5] = base[3] + rng.randn(16).astype("float32") * 0.01  # near-dup of 3
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_cosine_topk_bruteforce(spark, vectors):
    q = vectors.filter("vec_id = 3").first()["embedding"]
    top = S.cosine_topk_bruteforce(vectors, q, k=3).collect()
    assert top[0]["vec_id"] == 3 and abs(top[0]["sim"] - 1.0) < 1e-6
    assert top[1]["vec_id"] == 5  # planted near-dup ranks second


def test_cosine_pairs_exact_and_lsh_agree_on_high_sim(spark, vectors):
    exact = {
        (r.id_a, r.id_b)
        for r in S.cosine_pairs_exact(vectors, threshold=0.9).collect()
    }
    assert (3, 5) in exact
    lsh = {
        (r.id_a, r.id_b)
        for r in S.cosine_pairs_lsh(
            vectors, threshold=0.9, dim=16, n_planes=6
        ).collect()
    }
    # LSH must find the planted near-identical pair (angle ~0 → all
    # sketch bits agree) and may only return a subset of exact pairs.
    assert (3, 5) in lsh and lsh <= exact


def test_cosine_pairs_lsh_caps_degenerate_buckets(spark):
    # A constant embedding column folds every vector into ONE bucket per
    # table; max_bucket must drop those buckets so the candidate join
    # can never go quadratic on pathological input.
    n = 40
    const = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    capped = S.cosine_pairs_lsh(
        const, threshold=0.9, dim=3, n_planes=4, n_tables=2, max_bucket=10
    )
    assert capped.count() == 0  # all buckets over cap → no candidates
    uncapped = S.cosine_pairs_lsh(
        const, threshold=0.9, dim=3, n_planes=4, n_tables=2, max_bucket=None
    )
    assert uncapped.count() == n * (n - 1) // 2  # identical vectors: all pairs


def test_ivf_topk_finds_planted_neighbor(spark, vectors):
    q = vectors.filter("vec_id = 3").first()["embedding"]
    top = S.ivf_topk(vectors, q, k=2, n_centroids=4, nprobe=2).collect()
    assert top[0]["vec_id"] == 3
    # vec 5 is in the same cluster as its near-identical twin
    assert top[1]["vec_id"] == 5


def test_duplicated_window_stats_planted_substring(spark):
    from hadoopxmlextractor_spark.operators.dedup import (
        duplicated_window_stats,
    )

    docs = spark.createDataFrame(
        [
            # docs 1 and 2 share the exact 6-token run "q w e r t y"
            # -> two duplicated 5-windows each; surrounding text unique
            (1, "a b c q w e r t y d e f"),
            (2, "u v q w e r t y m n o"),
            # doc 3: all-unique text, zero duplicated windows
            (3, "z1 z2 z3 z4 z5 z6 z7"),
            # doc 4: shorter than k -> no windows, drops out
            (4, "s1 s2 s3"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_window_stats(
            docs, "text", "doc_id", k=5
        ).collect()
    }
    assert 4 not in out
    assert out[3]["n_dup_windows"] == 0
    # "q w e r t" and "w e r t y" occur in both docs
    assert out[1]["n_dup_windows"] == 2
    assert out[2]["n_dup_windows"] == 2
    assert out[1]["n_windows"] == 8  # 12 tokens -> 8 stride-1 windows
    assert out[2]["n_windows"] == 7
    assert abs(out[2]["dup_window_fraction"] - round(2 / 7, 6)) < 1e-9


def test_source_overlap_counts_distinct_shared_windows(spark):
    from hadoopxmlextractor_spark.operators.dedup import source_overlap

    docs = spark.createDataFrame(
        [
            # crawl docs share the window "q w e r t" with curated;
            # the window repeats WITHIN crawl (docs 1+2) but must count
            # once per source pair (distinct windows, not occurrences)
            (1, "crawl", "a b q w e r t c d"),
            (2, "crawl", "q w e r t x y z1 z2"),
            (3, "curated", "m n q w e r t o p"),
            # books shares nothing 5 tokens long with anyone
            (4, "books", "b1 b2 b3 b4 b5 b6"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r["source_a"], r["source_b"]): r["n_shared_windows"]
        for r in source_overlap(
            docs, "text", "doc_id", "source", k=5
        ).collect()
    }
    assert out == {("crawl", "curated"): 1}


def test_minhash_incremental_flags_corpus_and_first_wins_batch(spark):
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators.dedup import minhash_incremental_flags

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        # corpus
        (1, base, False),
        (2, "completely different text about database engines and plans", False),
        # batch: 10 near-dups the corpus doc, 11+12 near-dup each other
        (10, base + " extra", True),
        (11, "apples bananas cherries dates elderberry figs grapes honeydew", True),
        (12, "apples bananas cherries dates elderberry figs grapes kiwi", True),
        (13, "nothing like anything else here at all whatsoever in words", True),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, incoming boolean")
    out = {
        r["doc"]: (r["near_dup_of_corpus"], r["near_dup_in_batch"])
        for r in minhash_incremental_flags(
            docs, "text", "doc_id", "incoming", num_hashes=64, bands=32, threshold=0.5
        ).collect()
    }
    assert set(out) == {10, 11, 12, 13}  # one row per incoming doc
    assert out[10] == (True, False)      # matches corpus, not batch
    assert out[11] == (False, False)     # FIRST of the in-batch pair: kept
    assert out[12] == (False, True)      # later twin flagged, first-wins
    assert out[13] == (False, False)


def test_quantize_int8_planted_and_zero_vector(spark):
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators import similarity as S

    df = spark.createDataFrame(
        [
            (1, [2.54, -1.27, 0.0, 1.27]),  # scale = 0.02, q = [127,-63,0,63]
            (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero guard
        ],
        "vec_id: long, embedding: array<float>",
    )
    rows = {
        r["vec_id"]: r
        for r in df.select("vec_id", S.quantize_int8("embedding").alias("q"))
        .select("vec_id", "q.*")
        .collect()
    }
    # float32(2.54) is a hair below 2.54, so scale*1e9 floors to
    # 19999999 and -1.27/scale lands at -63.49..: q = [127, -63, 0, 64].
    assert rows[1]["scale_e9"] == 19999999
    assert rows[1]["q_l1"] == 254
    assert rows[1]["q_checksum"] == 257
    assert rows[2]["scale_e9"] == 0
    assert rows[2]["q_l1"] == 0 and rows[2]["q_checksum"] == 0


def test_knn_classify_planted_majority(spark):
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators import similarity as S

    # Probe 0 points along +x; ids 1-3 near +x with label 7, ids 4-5
    # near +y with label 2 -> top-3 vote must be label 7, correct=False
    # (probe's own label is 9).
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [0.9, 0.1], 7),
        (2, [0.8, 0.05], 7),
        (3, [0.95, 0.2], 7),
        (4, [0.1, 0.9], 2),
        (5, [0.0, 1.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    )
    probes = emb.filter(F.col("vec_id") == 0)
    out = S.knn_classify(emb, probes, k=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["pred_label"] == 7 and r["votes"] == 3 and r["correct"] is False


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_stars_components_match_union_find_ground_truth(spark):
    import random

    from hadoopxmlextractor_spark.operators.dedup import connected_components_stars

    rng = random.Random(7)
    cases = []
    # random graphs of varying density
    for n, m in [(30, 15), (40, 60), (25, 5)]:
        cases.append(
            [(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)]
        )
    # pathological diameter: a 300-node chain (min-label would need 300
    # rounds; stars needs O(log^2))
    cases.append([(i, i + 1) for i in range(300)])
    # two cliques + an isolated edge
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    cases.append(clique + [(x + 100, y + 100) for x, y in clique] + [(900, 901)])

    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        truth = _uf_components(edges)
        df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
        got = {
            r["doc_id"]: (r["component_id"], r["is_canonical"])
            for r in connected_components_stars(df).collect()
        }
        assert set(got) == set(truth)
        for node, root in truth.items():
            assert got[node] == (root, node == root), (node, got[node], root)


def test_stars_agrees_with_min_label_on_dedup_shapes(spark):
    from hadoopxmlextractor_spark.operators.dedup import (
        connected_components,
        connected_components_stars,
    )

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    a = sorted(tuple(r) for r in connected_components(pairs).collect())
    b = sorted(tuple(r) for r in connected_components_stars(pairs).collect())
    assert a == b


def test_bloom_incremental_exact_even_with_forced_false_positives(spark):
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators.dedup import (
        bloom_build,
        bloom_incremental_flags,
    )

    corpus_rows = [(f"c{i}", f"corpus doc {i}") for i in range(30)]
    batch_rows = (
        [(f"b{i}", f"corpus doc {i}") for i in range(5)]  # dups of corpus
        + [(f"n{i}", f"fresh doc {i}") for i in range(20)]  # new
        + [("r1", "repeated"), ("r2", "repeated")]  # in-batch dup
    )
    corpus = spark.createDataFrame(corpus_rows, "doc_id string, text string").select(
        F.md5("text").alias("h")
    )
    batch = spark.createDataFrame(batch_rows, "doc_id string, text string").select(
        "doc_id", F.md5("text").alias("h")
    )

    expected = {
        **{f"b{i}": (True, False) for i in range(5)},
        **{f"n{i}": (False, False) for i in range(20)},
        "r1": (False, False),
        "r2": (False, True),
    }
    # m=64 bits with 30 members: heavy collision load — false positives
    # are near-certain, and the exact verify join must erase them all.
    for m_bits in (64, 1 << 17):
        got = {
            r["doc_id"]: (r["dup_of_corpus"], r["dup_in_batch"])
            for r in bloom_incremental_flags(
                corpus, batch, "h", "doc_id", m_bits=m_bits
            ).collect()
        }
        assert got == expected, m_bits

    # and the filter itself never false-negatives: every corpus member
    # tests positive against the built bitmap
    import numpy as np

    from hadoopxmlextractor_spark.operators.dedup import _bloom_positions

    bm = np.frombuffer(bloom_build(corpus, "h", m_bits=1 << 17), dtype=np.uint8)
    for row in corpus.collect():
        assert all(
            bm[p >> 3] & (1 << (p & 7))
            for p in _bloom_positions(row["h"], 1 << 17)
        )


def test_bloom_positions_batch_matches_scalar():
    # The vectorized hex decode must agree digit-for-digit with the
    # scalar int(hex[i:i+8], 16) % m_bits path, including extreme
    # digests (all-0, all-f) and both hex cases.
    import hashlib

    import pandas as pd

    hs = [hashlib.md5(str(i).encode()).hexdigest() for i in range(257)]
    hs += ["0" * 32, "f" * 32, "F" * 32, "0123456789abcdefABCDEF0123456789"]
    for m_bits in (1 << 11, 1 << 17, 1000):
        batch = D._bloom_positions_batch(pd.Series(hs), m_bits)
        for row, h in zip(batch.tolist(), hs):
            assert tuple(row) == D._bloom_positions(h.lower(), m_bits), h
    # and the packed bitmap reproduces the scalar bit layout
    import numpy as np

    pos = D._bloom_positions_batch(pd.Series(hs), 1 << 11)
    bm = D._bloom_bitmap_from_positions(pos, 1 << 11)
    ref = np.zeros((1 << 11) // 8, dtype=np.uint8)
    for h in hs:
        for p in D._bloom_positions(h.lower(), 1 << 11):
            ref[p >> 3] |= np.uint8(1 << (p & 7))
    assert bm.tobytes() == ref.tobytes()
    assert D._bloom_test_positions(bm, pos).all()


def test_bloom_build_tree_fanin_matches_flat_merge(spark):
    # Round-3 verdict item 2: the OR-merge must happen executor-side
    # (treeReduce), and the result must equal a naive driver-side build
    # — forced over ≥64 partitions so the tree actually has fan-in.
    import numpy as np
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators.dedup import (
        _bloom_positions,
        bloom_build,
    )

    m_bits = 1 << 14
    corpus = (
        spark.range(2000)
        .repartition(64)
        .select(F.md5(F.col("id").cast("string")).alias("h"))
    )
    assert corpus.rdd.getNumPartitions() == 64
    got = np.frombuffer(bloom_build(corpus, "h", m_bits=m_bits), dtype=np.uint8)
    want = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in corpus.collect():
        for p in _bloom_positions(row["h"], m_bits):
            want[p >> 3] |= np.uint8(1 << (p & 7))
    assert (got == want).all()


def test_bloom_sharded_flags_identical_to_plain_join(spark):
    # The ≥1e9-member shape: distributed per-shard bitmaps + cogroup
    # probe must produce EXACTLY the plain left-join flags, with the
    # corpus forced across ≥64 partitions and a deliberately small
    # per-shard m so false positives occur and must be erased by the
    # verify join. Also checks no shard bitmap ever hits the driver:
    # bloom_build_sharded returns a DataFrame, and we only aggregate it.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators.dedup import (
        bloom_build_sharded,
        bloom_incremental_flags_sharded,
    )

    n = 3000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # ids 0..999 are corpus; 1000..1999 duplicate their text; rest new
        F.md5(
            F.when(F.col("id") < 2000, (F.col("id") % 1000).cast("string")).otherwise(
                F.col("id").cast("string")
            )
        ).alias("h"),
    )
    corpus = base.filter(F.col("doc_id") < 1000).select("h").repartition(64)
    batch = base.filter(F.col("doc_id") >= 1000).select("doc_id", "h").repartition(16)

    got = {
        r["doc_id"]: (r["dup_of_corpus"], r["dup_in_batch"])
        for r in bloom_incremental_flags_sharded(
            corpus, batch, "h", "doc_id", n_shards=64, m_bits_per_shard=256
        ).collect()
    }
    w = Window.partitionBy("h").orderBy("doc_id")
    want = {
        r["doc_id"]: (r["dup_of_corpus"], r["dup_in_batch"])
        for r in batch.join(
            corpus.distinct().withColumn("hit", F.lit(True)), "h", "left"
        )
        .select(
            "doc_id",
            F.coalesce("hit", F.lit(False)).alias("dup_of_corpus"),
            (F.row_number().over(w) > 1).alias("dup_in_batch"),
        )
        .collect()
    }
    assert got == want
    # shard table shape: one row per occupied shard, all shards covered
    blooms = bloom_build_sharded(corpus, "h", n_shards=64, m_bits_per_shard=256)
    stats = blooms.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("bshard").alias("d")
    ).collect()[0]
    assert stats["n"] == stats["d"] == 64  # 1000 keys over 64 shards: all hit


def _kmeans_replay(ids, vecs, k, rounds):
    """Pure-Python mirror of similarity.kmeans_assignments (quantize →
    md5-ranked seeds → Lloyd with lowest-cid ties, floor-div updates,
    empty clusters keep their centroid)."""
    import hashlib

    import numpy as np

    from hadoopxmlextractor_spark.operators.similarity import quantize_vec

    q = {}
    for i, v in zip(ids, vecs):
        _, qv = quantize_vec(np.asarray(v, dtype=np.float64))
        q[i] = qv + 127
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [q[i].copy() for i in order[:k]]

    def assign():
        out = {}
        for i in ids:
            dists = [int(((q[i] - c) ** 2).sum()) for c in cents]
            best = min(range(len(cents)), key=lambda j: (dists[j], j))
            out[i] = (best, dists[best])
        return out

    for _ in range(rounds):
        a = assign()
        for cid in range(k):
            members = [q[i] for i in ids if a[i][0] == cid]
            if members:
                s = np.sum(members, axis=0)
                cents[cid] = s // len(members)
    return assign()


def test_kmeans_planted_two_clusters(spark):
    from hadoopxmlextractor_spark.operators import similarity as S

    rows = [(i, [10.0 + (i % 3), 0.0, 1.0]) for i in range(6)] + [
        (i, [-10.0 - (i % 3), 8.0, -1.0]) for i in range(6, 12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in S.kmeans_assignments(emb, k=2, rounds=2).collect()
    }
    left = {got[i] for i in range(6)}
    right = {got[i] for i in range(6, 12)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_kmeans_matches_python_replay(spark):
    from hadoopxmlextractor_spark.operators import similarity as S

    # Deterministic ragged cloud incl. an all-zero vector (scale=0
    # branch) and duplicated points (assignment tie-breaks).
    rows = []
    for i in range(40):
        base = [
            ((i * 7919 + d * 104729) % 200 - 100) / 17.0 for d in range(8)
        ]
        if i == 13:
            base = [0.0] * 8
        if i in (20, 21):
            base = [5.0] * 8
        rows.append((i, base))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["centroid_id"], r["dist"])
        for r in S.kmeans_assignments(emb, k=4, rounds=3).collect()
    }
    want = _kmeans_replay(
        [i for i, _ in rows], [v for _, v in rows], 4, 3
    )
    assert got == {i: (c, d) for i, (c, d) in want.items()}


def test_dedup_kernels_handle_megabyte_document(spark):
    """Robustness pin: a pathologically large document must flow
    through the Arrow kernels (shingle, MinHash, SimHash) without
    blowing a batch — per-doc state is O(tokens), and one huge doc
    among small ones must not perturb their outputs."""
    from hadoopxmlextractor_spark.operators import dedup as D

    big = " ".join(f"w{i % 50021}" for i in range(150_000))  # ~1 MB
    rows = [(1, big), (2, "small doc one two three"), (3, big)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {r["doc"]: tuple(r["signature"]) for r in D.minhash_signatures(
        docs, "text", "doc_id", num_hashes=8
    ).collect()}
    assert sigs[1] == sigs[3] != sigs[2]

    pairs = D.dedup_minhash_lsh(
        docs, "text", "doc_id", num_hashes=8, bands=4
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 3)}


def test_new_round3_operators_accept_empty_input(spark):
    """A fully-filtered upstream (0 rows) must yield 0 rows, never a
    crash, from every round-3 operator with driver-side loops."""
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators import similarity as S
    from hadoopxmlextractor_spark.operators import text as T

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert S.kmeans_assignments(emb, k=4, rounds=2).count() == 0

    docs = spark.createDataFrame([], "doc_id long, text string")
    w, _ = T.perceptron_train(docs, "text", "doc_id", dim=8, rounds=2)
    assert list(w) == [0] * 8
    assert T.perceptron_predictions(docs, "text", "doc_id", dim=8, rounds=2).count() == 0
    assert T.regression_suffstats(docs, "text", "doc_id", dim=8).count() == 0
    assert (
        T.token_chi2(docs, "text", "doc_id", F.lit(True), min_df=1).count() == 0
    )


def test_containment_catches_subset_duplication_jaccard_misses(spark):
    from hadoopxmlextractor_spark.operators import dedup as D

    pasted = " ".join(f"core{i}" for i in range(20))
    big = " ".join(f"host{i}" for i in range(400)) + " " + pasted
    docs = spark.createDataFrame(
        [(1, pasted), (2, big), (3, "unrelated words entirely different")],
        "doc_id long, text string",
    )
    jac = D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5, max_df=None)
    assert jac.count() == 0  # symmetric score is blind to the paste
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in D.ngram_containment_pairs(
            docs, "text", "doc_id", threshold=0.9, max_df=None
        ).collect()
    }
    assert set(cont) == {(1, 2)} and cont[(1, 2)] == 1.0


def test_binary_quantize_matches_python_pack(spark, vectors):
    packed = {r.vec_id: r.word0 for r in S.binary_quantize(vectors, dim=16).collect()}
    for row in vectors.collect():
        w = 0
        for j, x in enumerate(row.embedding):
            if x >= 0:
                w |= 1 << j
        assert packed[row.vec_id] == w


def test_binary_quantize_packs_sign_lane_as_signed_int64(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [-1.0] * 63 + [1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.word0 for r in S.binary_quantize(df, dim=64).collect()}
    assert got[0] == -1  # all 64 bits set → two's-complement -1
    assert got[1] == -(1 << 63)  # only bit 63 set → min int64


def test_hamming_topk_binary_finds_planted_twin(spark, vectors):
    q = vectors.filter("vec_id = 3").first()["embedding"]
    top = S.hamming_topk_binary(vectors, q, dim=16, k=3, candidates=20).collect()
    assert top[0]["vec_id"] == 3 and top[0]["hamming"] == 0
    assert abs(top[0]["sim"] - 1.0) < 1e-6
    # the near-identical twin's sign pattern collides (tiny perturbation
    # flips only near-zero coordinates) and exact re-rank puts it second
    assert top[1]["vec_id"] == 5


def test_kmv_overlap_exact_branch_unsaturated(spark):
    # 6 + 6 docs sharing 3; k=64 ≫ union → sketches are the full sets,
    # so the CASE's exact branch must return exact values.
    rows = [("a", f"doc {i}") for i in range(6)] + [
        ("b", f"doc {i}") for i in range(3, 9)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = D.kmv_source_overlap(df, "text", "source", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k_used == 9 and r.n_common == 3
    assert r.union_est == 9.0
    assert abs(r.jaccard_est - 3.0 / 9.0) < 1e-12
    assert abs(r.inter_est - 3.0) < 1e-9


def test_kmv_cardinality_exact_at_exactly_k(spark):
    # A source with EXACTLY k distinct docs has a COMPLETE sketch — it
    # proves the exact count, so the estimator must not engage until a
    # (k+1)-th distinct value is actually observed.
    rows = [("a", f"doc {i}") for i in range(8)] + [
        ("b", f"doc {i}") for i in range(9)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.source: (r.n_sketch, r.distinct_est, r.saturated)
        for r in D.kmv_cardinality(df, "text", "source", k=8).collect()
    }
    assert got["a"] == (8, 8.0, False)  # complete sketch → exact
    n, est, sat = got["b"]
    assert n == 8 and sat is True and est != 9.0  # witness seen → estimator


def test_kmv_estimator_reasonable_when_saturated(spark):
    # 200 ∪ 200 with 100 shared (true union 300, J = 1/3); k=32
    # saturates, so the (k-1)/u_k branch runs. md5 priorities are
    # fixed, so these loose ±3σ bands are deterministic documentation,
    # not flaky sampling.
    rows = (
        [("a", f"L{i}") for i in range(200)]
        + [("b", f"R{i}") for i in range(100)]
        + [("b", f"L{i}") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "source string, text string")
    r = D.kmv_source_overlap(df, "text", "source", k=32).collect()[0]
    assert r.k_used == 32
    assert 150 <= r.union_est <= 600
    assert 0.05 <= r.jaccard_est <= 0.7


def test_ngram_candidate_budget_guard_raises_on_blowup(spark):
    # A pathologically repetitive corpus (everyone shares every
    # shingle) must FAIL FAST with LSH routing guidance, not launch the
    # quadratic self-join. 30 identical docs → C(30,2)=435 candidates
    # per shingle; budget 100 trips before the join runs.
    rows = [(i, "the same exact sentence repeated verbatim here") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="minhash_lsh"):
        D.ngram_jaccard_pairs(
            df, "text", "doc_id", n=3, threshold=0.8, candidate_budget=100
        ).count()
    # same guard on the containment variants
    with pytest.raises(ValueError, match="candidate budget"):
        D.ngram_containment_pairs(
            df, "text", "doc_id", n=3, threshold=0.8, candidate_budget=100
        ).count()
    with pytest.raises(ValueError, match="candidate budget"):
        D.ngram_containment_edges(
            df, "text", "doc_id", n=3, threshold=0.6, candidate_budget=100
        ).count()
    # an explicit budget covering the fan-out (or the auto default on
    # this tiny corpus) lets the exact path run to completion
    got = D.ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.8).count()
    assert got == 30 * 29 // 2


def test_auto_route_falls_back_to_lsh_and_records_decision(spark):
    """route='auto' (r6 verdict item 4): a guard-tripping corpus
    transparently returns LSH pairs in the unified (doc_a, doc_b,
    jaccard, route) shape, and the decision is recorded as a
    lint-shaped finding in ROUTE_DECISIONS; a within-budget corpus
    routes exact with the same shape. Both exact joins share the
    contract."""
    rows = [(i, "the same exact sentence repeated verbatim here") for i in range(30)]
    dup = spark.createDataFrame(rows, "doc_id long, text string")

    D.ROUTE_DECISIONS.clear()
    got = D.ngram_jaccard_pairs(
        dup, "text", "doc_id", n=3, threshold=0.8,
        candidate_budget=100, route="auto",
    )
    assert got.columns == ["doc_a", "doc_b", "jaccard", "route"]
    pairs = got.collect()
    assert len(pairs) == 30 * 29 // 2  # identical docs: LSH finds all
    assert all(r.route == "lsh" and r.jaccard == 1.0 for r in pairs)
    assert [d["code"] for d in D.ROUTE_DECISIONS] == ["lsh_reroute"]
    assert D.ROUTE_DECISIONS[0]["severity"] == "warning"
    assert D.ROUTE_DECISIONS[0]["op"] == "ngram_jaccard_pairs"

    # prefix-filter variant, same contract
    D.ROUTE_DECISIONS.clear()
    got = D.prefix_filter_jaccard_pairs(
        dup, "text", "doc_id", n=3, threshold_pct=80,
        candidate_budget=50, route="auto",
    )
    assert got.columns == ["doc_a", "doc_b", "jaccard", "route"]
    assert got.count() == 30 * 29 // 2
    assert [d["code"] for d in D.ROUTE_DECISIONS] == ["lsh_reroute"]

    # within budget: exact route, same unified shape, exact jaccards
    distinct = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "one two three four five six seven")],
        "doc_id long, text string",
    )
    D.ROUTE_DECISIONS.clear()
    got = D.ngram_jaccard_pairs(
        distinct, "text", "doc_id", n=3, threshold=0.8, route="auto"
    ).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard, r.route) for r in got] == [
        (1, 2, 1.0, "exact")
    ]
    assert [d["code"] for d in D.ROUTE_DECISIONS] == ["exact_route"]

    # route='raise' (the default) keeps the fail-fast contract
    with pytest.raises(ValueError, match="candidate budget"):
        D.prefix_filter_jaccard_pairs(
            dup, "text", "doc_id", n=3, threshold_pct=80, candidate_budget=50
        ).count()


def test_containment_edges_are_directed(spark):
    rows = [(1, "a b c d e f g h"), (2, "x y z a b c d e f g h q w")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.container, r.contained)
        for r in D.ngram_containment_edges(
            df, "text", "doc_id", n=3, threshold=0.8
        ).collect()
    ]
    # doc 1 is pasted inside doc 2 → exactly one edge, container side 2
    assert got == [(2, 1)]


def test_hits_separates_aggregators_from_templates(spark):
    # star: 10 quotes {1,2,3} (an aggregator); 4<->5 mutual near-copies
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (4, 5), (5, 4)],
        "container long, contained long",
    )
    out = {
        r.doc_id: (r.hub_fp, r.auth_fp)
        for r in D.hits(edges, iterations=4).collect()
    }
    assert out[10][0] > 0 and out[10][1] == 0  # pure hub: quotes, never quoted
    for leaf in (1, 2, 3):
        assert out[leaf][1] > 0 and out[leaf][0] == 0  # pure authorities
    # the mutual pair is symmetric across nodes (4 and 5 identical),
    # though hub != auth within a node (the a-then-h half-step order)
    assert out[4] == out[5] and out[4][0] > 0 and out[4][1] > 0
    # the star's aggregator outranks the mutual pair as a hub (it
    # concentrates 3 authorities), and its leaves outrank the pair as
    # authorities — the role separation PageRank cannot express
    assert out[10][0] > out[4][0]
    assert out[1][1] > out[4][1]


def test_sorted_neighborhood_finds_prefix_neardups(spark):
    # Two docs sharing a long prefix (re-crawl with appended footer)
    # land in the same block, adjacent in sort order; an unrelated doc
    # and a same-block-but-dissimilar doc must NOT pair.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " appended footer"),  # prefix near-dup of 1
        (3, "alpha beta gzzz completely different tail words here now"),
        (4, "unrelated text that sorts into a different block entirely"),
        (5, None),
        (6, "   "),  # whitespace-only: dropped, no 0/0 division
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = D.sorted_neighborhood_pairs(
        df, "text", "doc_id", block_prefix=12, window=3, threshold=0.5
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in got.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.8
    assert all(p == (1, 2) for p in pairs)


def test_sorted_neighborhood_window_bounds_candidates(spark):
    # candidate pairs are bounded by (window-1) per doc even when every
    # doc shares one block (the hot-block worst case).
    rows = [(i, f"same prefix words {i:04d}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = D.sorted_neighborhood_pairs(
        df, "text", "doc_id", block_prefix=12, window=4, threshold=0.0
    )
    # every pair is within distance 3 in sorted (here: id) order
    assert got.count() == 19 + 18 + 17
    assert got.filter((F.col("doc_b") - F.col("doc_a")) > 3).count() == 0


def test_bitext_mutual_top1_planted_translation(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(64).astype("float32") for i in range(0, 8, 2)}
    rows = [(i, [float(x) for x in v]) for i, v in vecs.items()]
    # odd ids = "target language": id 1 is an exact translation of 0
    # (same direction), id 3 is a noisy translation of 2; ids 5/7 are
    # unrelated target-side vectors.
    rows.append((1, [float(x) for x in vecs[0]]))
    rows.append((3, [float(x) for x in (vecs[2] + 0.1 * rng.randn(64).astype("float32"))]))
    rows.append((5, [float(x) for x in rng.randn(64).astype("float32")]))
    rows.append((7, [float(x) for x in rng.randn(64).astype("float32")]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = S.cosine_pairs_lsh(emb, threshold=0.3, dim=64, n_planes=2, n_tables=8)
    got = {(r.src, r.dst): r for r in S.bitext_mutual_top1(pairs).collect()}
    assert (0, 1) in got and got[(0, 1)].sim == 1.0
    assert (2, 3) in got and got[(2, 3)].sim > 0.9
    # mutual-top-1 is one-to-one: no src or dst appears twice
    srcs = [s for s, _ in got]
    dsts = [d for _, d in got]
    assert len(set(srcs)) == len(srcs) and len(set(dsts)) == len(dsts)
    # min_margin filters indecisive pairs but keeps the exact twin
    strict = S.bitext_mutual_top1(pairs, min_margin=0.2)
    kept = {(r.src, r.dst) for r in strict.collect()}
    assert (0, 1) in kept


def test_fuzzy_join_links_typo_classes_not_exact_dups(spark):
    rows = [
        (1, "goldenrod lavender spring"),
        (2, "goldenrod lavender spring"),   # exact dup of 1: same class
        (3, "goldenrod lavender sprinG"),   # typo: dist 1 from class {1,2}
        (4, "goldenrod lavender xyzzy"),    # dist 5: beyond max_dist
        (5, "chartreuse lavender spring"),  # different first token: other block
    ]
    df = spark.createDataFrame(rows, "pid long, name string")
    got = {(r.id_a, r.id_b): r.dist for r in
           D.fuzzy_join(df, "name", "pid", max_dist=2).collect()}
    # class rep of {1,2} is 1; exact-dup pair (1,2) must NOT appear
    assert got == {(1, 3): 1}


def test_fuzzy_join_block_cap_is_deterministic(spark):
    # 30 distinct variants sharing a block: the cap drops the block
    # entirely, so a pathological boilerplate prefix can't go quadratic.
    rows = [(i, f"prefix var{i:02d}") for i in range(30)]
    df = spark.createDataFrame(rows, "pid long, name string")
    assert D.fuzzy_join(df, "name", "pid", max_dist=2, max_block=10).count() == 0
    assert D.fuzzy_join(df, "name", "pid", max_dist=2, max_block=100).count() > 0


def test_paragraph_dedup_first_wins_across_docs(spark):
    # doc 2's first 4-token paragraph is a verbatim copy of doc 1's
    # second; doc 3 is a full recrawl of doc 1 — paragraph-granularity
    # dedup must flag exactly the later copies (first-wins by
    # (doc_id, para_idx)).
    rows = [
        (1, "a b c d e f g h"),          # paras: [a b c d] [e f g h]
        (2, "e f g h x y z w"),          # first para copies doc1 para2
        (3, "a b c d e f g h"),          # full recrawl of doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_paras, r.n_dup_paras, r.dup_frac)
        for r in D.paragraph_dedup_stats(df, "text", "doc_id", para_tokens=4).collect()
    }
    assert got[1] == (2, 0, 0.0)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (2, 2, 1.0)
    # short tail paragraph hashes on its own truncated text
    short = spark.createDataFrame([(9, "p q r s t")], "doc_id long, text string")
    r = D.paragraph_dedup_stats(short, "text", "doc_id", para_tokens=4).collect()[0]
    assert (r.n_paras, r.n_dup_paras) == (2, 0)


def test_maxsim_rewards_partial_match_pooled_cosine_misses(spark):
    # Query group 0 = 2 orthogonal unit vectors. Candidate group 1
    # contains an EXACT copy of each query vector (plus noise axes) →
    # MaxSim = 2.0. Candidate group 2 is the pooled average of the two
    # query vectors in both slots: each cosine is ~0.707, MaxSim ~1.41
    # — late interaction must rank group 1 first even though both
    # groups "contain the query's meaning" under average-pooling.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),   # query
        (2, [1.0, 0.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0, 0.0]),   # group 1
        (4, [0.7071, 0.7071, 0.0, 0.0]), (5, [0.7071, 0.7071, 0.0, 0.0]),
        (6, [0.0, 0.0, 1.0, 0.0]), (7, [0.0, 0.0, 0.0, 1.0]),   # unrelated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = S.maxsim_topk_multivector(
        emb, query_group=0, group_size=2, k=3
    ).collect()
    assert [r.group_id for r in got] == [1, 2, 3]
    assert abs(got[0].maxsim - 2.0) < 1e-9
    assert abs(got[1].maxsim - 2 * 0.707107) < 1e-3
    assert abs(got[2].maxsim - 0.0) < 1e-9


def test_mmr_skips_near_duplicate_of_selected(spark):
    # vec 2 is an EXACT copy of vec 1 (both most query-relevant); vec 3
    # is near-orthogonal with small relevance. Plain top-2 = {1, 2};
    # MMR at lambda 0.5 must pick 1 then penalize the copy
    # (sim-to-selected 1.0 makes its marginal score negative) and take
    # the diverse 3 instead.
    rows = [
        (1, [1.0, 0.05, 0.0]),
        (2, [1.0, 0.05, 0.0]),    # exact copy of 1
        (3, [0.1, 0.0, 0.995]),   # diverse, slight relevance
        (4, [-1.0, 0.0, 0.0]),    # anti-relevant
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = S.mmr_diversified_topk(
        emb, [1.0, 0.0, 0.0], k=2, pool=4, lam_tenths=5
    ).collect()
    assert [r.vec_id for r in got] == [1, 3]  # rank-1 tie → lowest id
    assert got[0].rank == 1 and got[1].rank == 2
    assert got[1].mmr_score > 0 > 5 * got[0].sim_q_micro - 5 * 1_000_000
    # lambda=10 degenerates to plain relevance order: copy comes back
    plain = S.mmr_diversified_topk(
        emb, [1.0, 0.0, 0.0], k=2, pool=4, lam_tenths=10
    ).collect()
    assert [r.vec_id for r in plain] == [1, 2]


def test_shared_run_pairs_finds_pasted_span(spark):
    # docs 1 and 2 share the verbatim 6-token span "q w e r t y"
    # inside unrelated text → run of 4 consecutive 3-shingles = 6
    # tokens; doc 3 shares nothing long enough.
    rows = [
        (1, "a b c q w e r t y d e f"),
        (2, "u v q w e r t y m n o p"),
        (3, "q w x e r z t y unrelated words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.longest_run_tokens
        for r in D.shared_run_pairs(
            df, "text", "doc_id", n=3, min_run_tokens=6
        ).collect()
    }
    assert got == {(1, 2): 6}
    # threshold above the span hides it
    assert (
        D.shared_run_pairs(df, "text", "doc_id", n=3, min_run_tokens=7).count()
        == 0
    )
    # an exact full-copy pair reports its whole token length
    dup = spark.createDataFrame(
        [(7, "one two three four five six seven eight"),
         (8, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    r = D.shared_run_pairs(dup, "text", "doc_id", n=3, min_run_tokens=6).collect()
    assert [(x.doc_a, x.doc_b, x.longest_run_tokens) for x in r] == [(7, 8, 8)]


def test_prefix_filter_join_equals_exact_inverted_index(spark, corpus):
    # The PPJoin-style prefix filter must find the IDENTICAL pair set
    # as the full inverted-index join — no false negatives (the formal
    # guarantee) and no false positives (the exact verify stage).
    pf = D.prefix_filter_jaccard_pairs(
        corpus, "text", "doc_id", n=3, threshold_pct=50
    )
    naive = D.ngram_jaccard_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.5,
        max_df=None, candidate_budget=None,
    )
    got = {(r.doc_a, r.doc_b): (r.shared, r.jaccard) for r in pf.collect()}
    want = {(r.doc_a, r.doc_b): (r.shared, r.jaccard) for r in naive.collect()}
    assert got == want
    assert (0, 10) in got and got[(0, 10)][1] == 1.0  # exact copy
    assert (1, 11) in got  # one-word near-copy


def test_prefix_filter_prunes_candidates(spark):
    # A corpus where every doc shares a HOT boilerplate shingle but only
    # planted twins are near-dups: the full index joins every pair
    # through the hot shingle; the df-ordered prefix leaves it out of
    # every prefix, so the candidate join touches only the twins.
    # bodies are mostly UNIQUE tokens so the df-ordered prefix (the
    # rarest ~half of each set) never reaches the hot boilerplate
    # shingles — the regime prefix filtering is built for
    boiler = "all rights reserved contact us terms"
    rows = []
    for i in range(40):
        body = " ".join(f"w{i}x{j}" for j in range(10))
        rows.append((i, f"doc {i} {body} {boiler}"))
    rows.append((100, rows[0][1]))  # planted twin of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # full-index co-shingled candidate count (what _ngram_pair_counts
    # would join): sum C(df,2) over shingles
    inv = (
        df.select(
            F.col("doc_id").alias("doc"),
            F.explode(D.shingle_hashes("text", 3)).alias("h"),
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    full_cands = inv.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("long")
    ).first()[0]

    # prefix candidate count: rebuild the operator's candidate stage
    from pyspark.sql import Window

    sh = df.select(
        F.col("doc_id").alias("doc"),
        D.shingle_hashes("text", 3).alias("hs"),
    ).withColumn("n_sh", F.size("hs"))
    invp = sh.select("doc", "n_sh", F.explode("hs").alias("h"))
    prefix = (
        invp.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("doc").orderBy("df", "h")),
        )
        .withColumn(
            "plen", F.col("n_sh") - F.expr("((50 * n_sh + 99) div 100)") + F.lit(1)
        )
        .filter(F.col("pos") <= F.col("plen"))
    )
    a = prefix.select("h", F.col("doc").alias("doc_a"))
    b = prefix.select("h", F.col("doc").alias("doc_b"))
    prefix_cands = (
        a.join(b, "h").filter(F.col("doc_a") < F.col("doc_b")).count()
    )
    assert full_cands > 40 * 39 / 2  # hot shingle makes it quadratic
    assert prefix_cands < full_cands / 10  # prefix filter prunes >10x

    # and the survivors are exactly the planted twin pair
    pairs = D.prefix_filter_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold_pct=50
    )
    assert {(r.doc_a, r.doc_b) for r in pairs.collect()} == {(0, 100)}


def test_prefix_filter_short_and_null_docs(spark):
    # docs shorter than the shingle width collapse to one whole-text
    # shingle; null text is dropped on both engines
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, None), (4, "other words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.prefix_filter_jaccard_pairs(df, "text", "doc_id", n=3)
    assert {(r.doc_a, r.doc_b) for r in pairs.collect()} == {(1, 2)}


def test_prefix_filter_candidate_budget_guard(spark):
    # df-flat blow-up corpus: every doc carries the same shingles, so
    # prefixes collide quadratically; budget 50 must trip BEFORE the
    # candidate join, with LSH routing guidance in the message
    rows = [(i, "same tokens everywhere forever repeated") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="prefix-filter candidate budget"):
        D.prefix_filter_jaccard_pairs(
            df, "text", "doc_id", n=3, threshold_pct=50, candidate_budget=50
        )
    # None disables the guard for a deliberately-sized slice
    pairs = D.prefix_filter_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold_pct=50, candidate_budget=None
    )
    assert pairs.count() == 30 * 29 / 2  # all-identical corpus


def test_connected_components_incremental_matches_full_recompute(spark):
    # old graph: two separate components {1,2} and {5,6}, plus old
    # singleton 9 (appears in labels with its own id); the NEW batch
    # bridges them (2-5 via new doc 100) and starts a fresh cluster
    # {200, 201}. The merged labels must equal a from-scratch resolve
    # over ALL edges — including the cross-old-component merge, which
    # only works because old connectivity rides the label star graph.
    old_pairs = spark.createDataFrame(
        [(1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    labels = D.connected_components(old_pairs)
    # old singleton: present in the standing labels but edge-free
    labels = labels.union(
        spark.createDataFrame([(9, 9, True)], labels.schema)
    )
    new_pairs = spark.createDataFrame(
        [(2, 100), (100, 5), (200, 201)], "doc_a long, doc_b long"
    )
    merged = D.connected_components_incremental(labels, new_pairs)
    got = {r.doc_id: (r.component_id, r.is_canonical) for r in merged.collect()}
    full = D.connected_components(
        old_pairs.union(new_pairs)
    )
    want = {r.doc_id: (r.component_id, r.is_canonical) for r in full.collect()}
    want[9] = (9, True)  # the full recompute never saw the singleton
    assert got == want
    # the bridge merged {1,2}, {5,6} and 100 into ONE component rooted
    # at the global min
    assert {got[k][0] for k in (1, 2, 5, 6, 100)} == {1}
    assert got[200] == (200, True) and got[201] == (200, False)
    assert got[9] == (9, True)


def test_connected_components_incremental_composes_repeatedly(spark):
    # three generations of ingest, each merging through the previous
    # labels — the lineage-truncation contract (a second iterative
    # loop over an un-checkpointed first one OOMs in plan generation)
    labels = D.connected_components(
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    )
    for k, (a, b) in enumerate([(2, 3), (3, 4), (4, 5)]):
        labels = D.connected_components_incremental(
            labels,
            spark.createDataFrame([(a, b)], "doc_a long, doc_b long"),
        )
    got = {r.doc_id: r.component_id for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_semdedup_prunes_planted_duplicates_and_guards_cluster_size(spark):
    """SemDeDup: an identical planted mirror is a guaranteed
    within-cluster near-dup — the original (tie -> lower id) survives,
    the plant is pruned; every vector appears exactly once in the
    verdict; and the max_cluster_size pre-flight fails fast instead of
    launching a quadratic pair stage."""
    import pytest
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators.similarity import semdedup_prune
    from hadoopxmlextractor_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
    )
    n_plants = planted.count()
    assert n_plants > 0
    out = semdedup_prune(
        emb.unionByName(planted), k=4, rounds=2,
        threshold_num=9, threshold_den=20,
    ).collect()
    verdict = {r.vec_id: r.kept for r in out}
    assert len(verdict) == emb.count() + n_plants  # one verdict per vector
    for r in out:
        if r.vec_id >= 1_000_000:
            assert verdict[r.vec_id] is False  # plant pruned
            assert verdict[r.vec_id - 1_000_000] is True  # original kept
    # the guard refuses a quadratic stage instead of launching it
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup_prune(emb, k=4, rounds=2, max_cluster_size=3)


def test_sentence_semdedup_prunes_planted_chunks_keeps_originals(spark):
    """Sentence-level SemDeDup (r6 verdict item 8): sub-document units
    ('.'-sentences sub-chunked to 8 tokens) pruned by the semdedup
    machinery. On sf0.001: plants exist, EVERY plant is pruned (its
    identical original dominates on (dist, id)), and the keep rule
    discriminates (most organic chunks survive at 0.95)."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    out = e.queries()["text_sentence_semdedup"](
        spark, "/root/testdata/sf0.001"
    ).cache()
    n = out.count()
    plants = out.filter(F.col("vec_id") >= 10**12).collect()
    assert len(plants) > 0
    assert all(not r.kept for r in plants)  # identical original wins
    kept_ratio = out.filter(F.col("kept")).count() / n
    assert 0.5 < kept_ratio < 1.0  # prunes, but not degenerately
    out.unpersist()


def test_minhash_lsh_scoped_suppresses_cross_scope_pairs(spark):
    """r8 scoped LSH: identical-text docs pair within a (lang, source)
    scope and are SUPPRESSED across scopes — and the unscoped operator
    would have found the cross-scope pair (so the suppression branch
    is provably live, vacuous-check rule). Scope must ride the join
    key, not a post-filter: the banded plan's join keys include the
    scope columns."""
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_candidates_scoped,
        minhash_signature_udf,
    )

    rows = []
    for i in range(8):
        text = f"alpha beta gamma delta epsilon zeta eta theta{i}"
        rows.append((i, "en", "web", text))
        rows.append((i + 100, "en", "web", text))      # same-scope dup
        rows.append((i + 200, "en", "mirror", text))    # cross-scope dup
    df = spark.createDataFrame(rows, "doc long, lang string, source string, text string")
    sig = minhash_signature_udf(num_hashes=64, shingle_n=3, seed=42)
    sigs = df.select("doc", "lang", "source", sig("text").alias("signature"))
    sigs = sigs.persist()
    sigs.count()

    scoped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates_scoped(
            sigs, ["lang", "source"], bands=32, rows_per_band=2
        ).collect()
    }
    unscoped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(
            sigs.select("doc", "signature"), bands=32, rows_per_band=2
        ).collect()
    }
    for i in range(8):
        assert (i, i + 100) in scoped          # same scope: found
        assert (i, i + 200) not in scoped      # cross scope: suppressed
        assert (i, i + 200) in unscoped        # ...but only BY the scope
        assert (i + 100, i + 200) not in scoped
    sigs.unpersist()
