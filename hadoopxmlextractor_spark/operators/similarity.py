"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k with JVM-side ``zip_with``/
``aggregate`` (no Python, no shuffle except the final top-k merge).
Scale paths: random-hyperplane LSH bucketing (near-dup pairs) and an
IVF-style partition index (top-k probes only a fraction of the data).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_pairs_udf() -> Column:
    """Vectorized pair-cosine kernel: ONE numpy batch op per Arrow batch.

    This is the verify step that runs UNDER the candidate joins, where
    JVM ``zip_with``/``aggregate`` lambdas are forbidden (they are
    interpreted, and Catalyst duplicates them into join-constraint
    Filter predicates pushed to both sides — the 433 s/task pathology
    recorded in SCALE.md). A pandas UDF is opaque to Catalyst: planned
    once, above the join, C-speed per batch.
    """
    import numpy as np

    @F.pandas_udf("double")
    def _cos(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for va, vb in it:
            if len(va) == 0:
                yield pd.Series([], dtype="float64")
                continue
            A = np.stack([np.asarray(v, dtype=np.float64) for v in va])
            B = np.stack([np.asarray(v, dtype=np.float64) for v in vb])
            num = (A * B).sum(axis=1)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            yield pd.Series(num / np.maximum(den, 1e-300))

    def kernel(a: Column, b: Column) -> Column:
        # guide-§4.4 marker: the sim column is always filtered/thresholded
        # right above; without it the optimizer pushes that filter and
        # re-evaluates the kernel twice per surviving row.
        return _cos.asNondeterministic()(a, b)

    return kernel


def cosine_topk_bruteforce(
    emb: DataFrame,
    query_vec: Sequence[float],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    The query ships as a literal array (broadcast in the task binary);
    the scan computes one fused dot/norm per row inside codegen and
    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k then a k×partitions driver merge, never a global sort. This
    is the 100 TB-safe exact path.

    For FILTERED search (the predicate+vector combo: "top-k among rows
    matching ..."), filter ``emb`` before calling — the predicate stays
    a plain Catalyst filter, reaches the parquet scan as a pushed
    filter, and the ranking only sees survivors (pre-filtering, never
    rank-then-filter, so the result is always k rows when k matches
    exist). ``carry`` passes metadata columns (e.g. the filter column)
    through to the output.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.round(cosine(F.col(vec_col), q), round_digits).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_range_search(
    emb: DataFrame,
    query_vec: Sequence[float],
    *,
    threshold: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine range query: every vector with similarity ≥
    ``threshold`` to one query vector. Same fused codegen'd dot/norm
    scan as :func:`cosine_topk_bruteforce`, but a threshold filter
    replaces TakeOrderedAndProject — the result is an unordered set,
    so at 100 TB this is a pure scan+filter with NO shuffle and no
    driver merge at all (cheaper than top-k). The filter applies to
    the ROUNDED similarity so the boundary set is identical across
    engines."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return emb.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_digits).alias("sim"),
    ).filter(F.col("sim") >= threshold)


def cosine_pairs_exact(
    emb: DataFrame,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 5,
) -> DataFrame:
    """All pairs with cosine ≥ threshold via broadcast self-join.

    O(n²/2) — correct baseline and oracle-checkable; use
    ``cosine_pairs_lsh`` when n is large.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    pair_cos = cosine_pairs_udf()
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim", F.round(pair_cos(F.col("vec_a"), F.col("vec_b")), round_digits)
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def hyperplane_sketch(
    emb: DataFrame,
    *,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 1,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Add a ``buckets`` array column: one integer bucket id per hash
    table, where bit j of table t's bucket = sign(v · h_{t·b+j}) over
    ``n_tables × n_planes`` seeded hyperplanes.

    P[one bit differs] = angle/π, so a pair at cosine s collides in one
    table with probability p^b (p = 1 − acos(s)/π) and in ANY table
    with 1 − (1−p^b)^T — banding buys recall the single-table sketch
    fundamentally cannot reach at moderate thresholds. Computed as ONE
    numpy matmul per Arrow batch in a pandas UDF: an interpreted
    ``aggregate``/``zip_with`` dot-product chain is never codegen'd,
    and as a plain JVM expression it gets duplicated into
    join-constraint filters pushed down to both self-join sides (see
    dedup.shingle_hashes for the observed pathology).
    """
    import numpy as np

    total = n_planes * n_tables
    planes = _hyperplanes(dim, total, seed)  # (T*b, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sketch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            if len(vecs) == 0:
                yield pd.Series([], dtype="object")
                continue
            M = np.stack(
                [np.zeros(dim) if v is None else np.asarray(v, dtype=np.float64) for v in vecs]
            )
            bits = (M @ planes.T) > 0  # (B, T*b)
            buckets = bits.reshape(len(M), n_tables, n_planes) @ weights  # (B, T)
            yield pd.Series(list(buckets.astype(np.int64)))

    return emb.withColumn(
        "buckets", _sketch.asNondeterministic()(F.col(vec_col))
    )


def cosine_pairs_lsh(
    emb: DataFrame,
    *,
    threshold: float,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    round_digits: int = 5,
    max_bucket: int | None = 10000,
    pair_filter=None,
) -> DataFrame:
    """Approximate near-dup pairs: banded hyperplane LSH — bucket each
    vector into ``n_tables`` tables of ``n_planes``-bit sketches,
    candidate = same bucket in ANY table, then exact cosine verify.

    Recall at cosine s is 1 − (1 − p^b)^T with p = 1 − acos(s)/π
    (defaults b=4, T=8: ≈0.79 at s=0.45, ≈0.97 at s=0.7, →1 as s→1);
    tighten b upward when the threshold is high to keep buckets small.
    Two shuffles: the (table, bucket) self-join and the pair-distinct
    — candidate count, not n², drives both, so cost tracks how sharply
    the threshold separates the data. ``max_bucket`` drops degenerate
    buckets (e.g. a constant/zero embedding column folds a whole table
    into one bucket) before the self-join so a pathological input can
    never go quadratic; the skip is deterministic (a property of the
    bucket's size), so the oracle replays it exactly.

    ``pair_filter`` (optional ``(id_a_col, id_b_col) -> bool Column``)
    prunes candidates INSIDE the bucket self-join, before the
    pair-dedup aggregate and the cosine verify. Use it when the caller
    discards a structurally-known pair class afterwards anyway (e.g.
    bitext mining keeps only cross-parity pairs): the nondeterministic
    cosine kernel blocks the optimizer from pushing such a filter down
    itself (guide §4.4 trade-off), so the pre-filter must be stated
    structurally (guide §3.2). Result-identical by construction
    whenever the caller's own filter implies it.
    """
    # The sketch feeds both self-join sides: persist + eager count so
    # the pandas-UDF lineage runs once (concurrent AQE stages would
    # otherwise race to recompute it before any block is cached).
    # Persist the COMPACT (id, vec, buckets-array) row and explode
    # after: caching the exploded form would duplicate every embedding
    # n_tables× in memory.
    compact = hyperplane_sketch(
        emb.select(id_col, vec_col),
        dim=dim,
        n_planes=n_planes,
        n_tables=n_tables,
        vec_col=vec_col,
        seed=seed,
    ).persist()
    compact.count()
    sk = compact.select(
        id_col, vec_col, F.posexplode("buckets").alias("t", "bucket")
    )
    if max_bucket is not None:
        big = (
            sk.groupBy("t", "bucket")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") > max_bucket)
            .select("t", "bucket")
        )
        sk = sk.join(big, ["t", "bucket"], "left_anti")
    a = sk.select(
        "t", "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = sk.select(
        "t", "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    pair_cos = cosine_pairs_udf()
    keep = F.col("id_a") < F.col("id_b")
    if pair_filter is not None:
        keep = keep & pair_filter(F.col("id_a"), F.col("id_b"))
    return (
        a.join(b, ["t", "bucket"])
        .filter(keep)
        # a pair colliding in several tables must verify and emit once
        .groupBy("id_a", "id_b")
        .agg(F.first("vec_a").alias("vec_a"), F.first("vec_b").alias("vec_b"))
        .withColumn("sim", F.round(pair_cos(F.col("vec_a"), F.col("vec_b")), round_digits))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def ivf_assign(
    emb: DataFrame,
    centroids,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid with a
    vectorized numpy pandas UDF (one matmul per Arrow batch)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @F.pandas_udf("int")
    def _assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            M = np.stack(vecs.to_numpy())
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            yield pd.Series(np.argmax(M @ Cn.T, axis=1).astype(np.int32))

    return emb.withColumn("centroid_id", _assign(F.col(vec_col)))


def ivf_build_centroids(
    emb: DataFrame,
    *,
    n_centroids: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 2048,
    seed: int = 42,
):
    """K-means-lite centroids from a deterministic sample (collected to
    the driver — the sample, not the table; at 100 TB this is still a
    few thousand rows)."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(10**9)))
        .limit(sample)
        .collect()
    )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ivf_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """IVF top-k: search only the ``nprobe`` clusters nearest the query.

    The assignment column would be precomputed and partition-pruned in a
    real deployment (write bucketed by centroid_id); here it's computed
    inline. Scans nprobe/n_centroids of the data instead of all of it.
    """
    import numpy as np

    C = ivf_build_centroids(emb, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ qn))[:nprobe].tolist()
    assigned = ivf_assign(emb, C, vec_col=vec_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("centroid_id").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qlit), round_digits).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def quantize_vec(a):
    """Per-vector int8 quantization kernel (pure numpy; property-tested
    directly): returns (scale, q int64 array). scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5) — round-half-up via floor because
    floor is bit-deterministic across engines."""
    import numpy as np

    m = float(np.abs(a).max()) if a.size else 0.0
    scale = m / 127.0
    if scale == 0.0:
        return 0.0, np.zeros(a.size, dtype=np.int64)
    return scale, np.floor(a / scale + 0.5).astype(np.int64)


def quantize_int8(col: Column | str) -> Column:
    """Symmetric per-vector int8 quantization summary — the storage
    path for embedding columns at corpus scale (float32 → int8 + one
    scale per vector is a 4× size cut with ~0.4% max relative error,
    the standard trade for ANN candidate stages; exact re-ranking
    reads the float column for finalists only).

    scale = max|x| / 127, q_i = floor(x_i/scale + 0.5) (round-half-up,
    chosen because ``floor`` is bit-deterministic across engines where
    "round half to even" implementations differ). Returns a struct of
    exact integers so the whole transform is oracle-checkable:
    ``scale_e9`` (floor(scale·1e9)), ``q_l1`` (Σ|q_i|), ``q_checksum``
    (Σ i·q_i, 1-based). All-zero vectors quantize to zeros with
    scale_e9 = 0.

    ONE Arrow-batched pandas UDF at scan bandwidth, zero shuffle —
    every step (float32→float64 widening, the max, the divide) is an
    exact IEEE op, so numpy here and DuckDB list arithmetic in the
    oracle agree bit-for-bit.
    """
    import numpy as np

    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("struct<scale_e9:long,q_l1:long,q_checksum:long>")
    def _quant(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for vecs in it:
            rows = []
            for v in vecs:
                a = (
                    np.asarray(v, dtype=np.float64)
                    if v is not None
                    else np.zeros(0)
                )
                scale, q = quantize_vec(a)
                if scale == 0.0:
                    rows.append((0, 0, 0))
                    continue
                idx = np.arange(1, a.size + 1, dtype=np.int64)
                rows.append(
                    (
                        int(np.floor(scale * 1e9)),
                        int(np.abs(q).sum()),
                        int((idx * q).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=["scale_e9", "q_l1", "q_checksum"])

    return _quant(c)


def binary_quantize(
    emb: DataFrame,
    *,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-bit binary quantization: pack each vector's ``dim`` sign
    bits (bit j of word w = 1 iff v[64w+j] >= 0) into ceil(dim/64)
    int64 words — the 32× compression tier below int8 (see
    :func:`quantize_int8`): 64 float32 dims become ONE 8-byte word.

    The packing is a pure projection built from 64 codegen'd
    ``element_at``/``shiftleft``/OR terms per word — no Python, no
    shuffle, scan-bandwidth. ``v >= 0`` is exact under float32→double
    widening (and -0.0 >= 0 is true in every IEEE engine), so the
    packed words are bit-identical across engines and the transform is
    oracle-checkable as plain integer arithmetic. At 100 TB the words
    are written once as a parquet sidecar and candidate generation
    never touches the float column again.
    """
    n_words = (dim + 63) // 64
    cols = [F.col(id_col)]
    for w in range(n_words):
        word = None
        for j in range(min(64, dim - 64 * w)):
            bit = (F.element_at(F.col(vec_col), 64 * w + j + 1) >= F.lit(0.0)).cast(
                "long"
            )
            term = F.shiftleft(bit, j)
            word = term if word is None else word.bitwiseOR(term)
        cols.append(word.alias(f"word{w}"))
    return emb.select(*cols)


def _pack_query_words(query_vec: Sequence[float], dim: int) -> list[int]:
    """Driver-side twin of :func:`binary_quantize` for one vector,
    returning SIGNED int64 words (two's complement, matching Spark)."""
    words = []
    for w in range((dim + 63) // 64):
        word = 0
        for j in range(min(64, dim - 64 * w)):
            if float(query_vec[64 * w + j]) >= 0.0:
                word |= 1 << j
        if word >= 1 << 63:
            word -= 1 << 64
        words.append(word)
    return words


def hamming_topk_binary(
    emb: DataFrame,
    query_vec: Sequence[float],
    *,
    dim: int,
    k: int = 20,
    candidates: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Two-stage binary ANN: hamming-distance candidate cut over the
    packed sign-bit words, then exact cosine re-rank of the survivors —
    the binary-quantization analogue of the PQ ADC-then-rerank path.

    Stage 1 scans ONLY the packed words (8 bytes per 64 dims):
    hamming = Σ_w bit_count(word_w XOR query_word_w), cut to the
    ``candidates`` lowest by (hamming, id) — TakeOrderedAndProject, so
    per-partition top-C then a C×partitions driver merge, never a
    global sort. Stage 2 broadcasts the candidate ids back onto the
    float column and re-ranks exactly; the cosine runs on exactly
    ``candidates`` post-join rows. Every stage is deterministic
    (integer hamming, id tiebreaks, rounded sims), so the full
    approximate pipeline is hash-exact and SQL-oracle-able.
    """
    packed = binary_quantize(emb, dim=dim, vec_col=vec_col, id_col=id_col)
    qwords = _pack_query_words(query_vec, dim)
    ham = None
    for w, qw in enumerate(qwords):
        term = F.bit_count(F.col(f"word{w}").bitwiseXOR(F.lit(qw))).cast("long")
        ham = term if ham is None else ham + term
    cand = (
        packed.select(F.col(id_col), ham.alias("hamming"))
        .filter(F.col("hamming").isNotNull())
        .orderBy(F.col("hamming"), F.col(id_col))
        .limit(candidates)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.join(F.broadcast(cand), on=id_col)
        .select(
            F.col(id_col),
            F.col("hamming"),
            F.round(cosine(F.col(vec_col), q), round_digits).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def knn_classify(
    emb: DataFrame,
    probes: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    round_digits: int = 5,
) -> DataFrame:
    """k-NN majority-vote label prediction: for each probe vector, the
    ``k`` nearest corpus rows by cosine (self excluded) vote with their
    labels; ties break (votes desc, label asc). Returns one row per
    probe: (vec_id, true_label, pred_label, votes, correct) — the
    standard embedding-quality / label-propagation audit for a
    training corpus.

    Scale shape: the PROBE set broadcasts (bounded — an eval panel,
    not the corpus), so the corpus side never shuffles for the scoring
    pass; the pair-cosine kernel is the vectorized pandas UDF planned
    above the join. ``row_number() <= k`` compiles to WindowGroupLimit:
    each input partition pre-prunes to k rows per probe BEFORE the
    probe-keyed exchange, so the shuffle carries O(k · probes ·
    partitions) rows, not probes × corpus. The vote aggregation is
    probe-keyed and tiny. For probe sets too large to broadcast, run
    the IVF path per probe shard instead.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.col(label_col).alias("true_label"),
    )
    pair_cos = cosine_pairs_udf()
    scored = (
        emb.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("nvec"),
            F.col(label_col).alias("nlabel"),
        )
        .join(F.broadcast(p), F.col("nid") != F.col("probe_id"))
        .select(
            "probe_id",
            "true_label",
            "nid",
            "nlabel",
            F.round(pair_cos(F.col("nvec"), F.col("probe_vec")), round_digits).alias(
                "sim"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("nid"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    votes = topk.groupBy("probe_id", "true_label", "nlabel").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("probe_id").orderBy(F.col("votes").desc(), F.col("nlabel"))
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            F.col("probe_id").alias("vec_id"),
            "true_label",
            F.col("nlabel").alias("pred_label"),
            F.col("votes").cast("bigint").alias("votes"),
            (F.col("nlabel") == F.col("true_label")).alias("correct"),
        )
    )


def pq_fit_codebooks(
    emb: DataFrame,
    *,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 2048,
    seed: int = 42,
):
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each L2-normalized
    vector into ``m`` subspaces and k-means each subspace to ``n_codes``
    centroids. Fit runs on the same bounded deterministic driver sample
    as :func:`ivf_build_centroids` — a few thousand rows at ANY corpus
    scale, never the table. Returns an (m, n_codes, dim//m) array."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(10**9)))
        .limit(sample)
        .collect()
    )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=min(n_codes, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return np.stack(books)  # (m, n_codes, dsub)


def pq_encode(
    emb: DataFrame,
    codebooks,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``codes`` column: ``m`` bytes per vector (nearest codebook
    entry per subspace of the L2-normalized vector). This is the
    storage artifact — 64 float32s become 8 small ints (32× smaller),
    which is what lets a scoring pass over a 100 TB vector corpus read
    gigabytes instead. One vectorized matmul batch per subspace inside
    a single Arrow pass, zero shuffle."""
    import numpy as np

    C = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, dsub)
    m, _, dsub = C.shape

    @F.pandas_udf("array<int>")
    def _enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            if len(vecs) == 0:
                yield pd.Series([], dtype="object")
                continue
            M = np.stack(vecs.to_numpy()).astype(np.float64)
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(M), m), dtype=np.int32)
            for j in range(m):
                S = M[:, j * dsub : (j + 1) * dsub]
                # ||s - c||² = ||s||² - 2 s·c + ||c||²; argmin over c
                d2 = -2.0 * (S @ C[j].T) + (C[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.Series(list(codes))

    return emb.withColumn("codes", _enc(F.col(vec_col)))


def pq_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    *,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """PQ top-k with asymmetric distance computation (ADC) + exact
    re-rank: score every row from its ``m``-byte code via a
    (m × n_codes) query-specific lookup table (approx cosine =
    Σ_j table[j, code_j]), take the top ``refine·k`` candidates with
    TakeOrderedAndProject, then re-rank ONLY those with the exact
    float cosine and keep ``k``.

    Scale shape: the scoring pass touches codes only (32× less I/O
    than floats), the lookup table is a few hundred doubles baked into
    the task closure, and the exact re-rank reads full vectors for
    refine·k rows — constant work. Complements IVF (which prunes ROWS)
    — production systems compose them (IVF-PQ); both pieces exist here
    independently so the composition is a filter + this function."""
    import numpy as np

    C = pq_fit_codebooks(
        emb, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    dsub = len(qn) // m
    # ADC table: inner product of each query subvector with each code.
    table = np.stack(
        [C[j] @ qn[j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, n_codes)

    @F.pandas_udf("double")
    def _adc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for codes in it:
            if len(codes) == 0:
                yield pd.Series([], dtype="float64")
                continue
            Cd = np.stack(codes.to_numpy())  # (B, m)
            yield pd.Series(table[np.arange(m)[None, :], Cd].sum(axis=1))

    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    cands = (
        pq_encode(emb, C, vec_col=vec_col)
        .select(id_col, vec_col, _adc(F.col("codes")).alias("approx"))
        .orderBy(F.col("approx").desc(), F.col(id_col))
        .limit(refine * k)
    )
    return (
        cands.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qlit), round_digits).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_pq_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-PQ: the standard large-scale ANN composition — IVF prunes
    ROWS (scan only the ``nprobe`` cells nearest the query), PQ
    shrinks BYTES (ADC over 8-byte codes within those cells), and the
    exact re-rank fixes the final ordering. At 100 TB with bucketed
    cell layout this reads nprobe/n_centroids of the rows × 1/32 of
    the vector bytes — the product of both levers, which is why every
    production vector store (FAISS IVFPQ, Milvus, Vespa) ships exactly
    this pairing."""
    import numpy as np

    C = ivf_build_centroids(
        emb, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ qn))[:nprobe].tolist()
    cells = ivf_assign(emb, C, vec_col=vec_col).filter(
        F.col("centroid_id").isin(probe)
    )
    return pq_topk(
        cells,
        query_vec,
        k=k,
        m=m,
        n_codes=n_codes,
        refine=refine,
        vec_col=vec_col,
        id_col=id_col,
        round_digits=round_digits,
    )


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd's) over quantized embeddings
# ---------------------------------------------------------------------------


def quantized_shifted(col: Column | str) -> Column:
    """Full int8-quantized vector as ``array<bigint>``, shifted to
    non-negative: ``q_i + 127`` ∈ [0, 254].

    The shift keeps every downstream integer op (centroid sums, floor
    divisions) on NON-NEGATIVE operands, where Spark's ``div``
    (truncates toward zero) and DuckDB's ``//`` (floors) coincide —
    the same cross-engine floor-division rule as the count-rank
    boundaries. Squared-L2 distances are shift-invariant, so the
    k-means geometry is unchanged. All-zero vectors quantize to the
    shifted origin (every lane 127), mirrored by the oracle's
    ``scale = 0`` branch.
    """
    import numpy as np

    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("array<long>")
    def _q(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            out = []
            for v in vecs:
                a = (
                    np.asarray(v, dtype=np.float64)
                    if v is not None
                    else np.zeros(0)
                )
                _, q = quantize_vec(a)
                out.append((q + 127).tolist())
            yield pd.Series(out)

    return _q.asNondeterministic()(c)


def _kmeans_assign_factory(cents):
    """Closure-factory (pandas UDFs resolve string annotations against
    module globals; extra params must ride a closure, not default
    args): nearest-centroid assignment against a fixed k×dim int64
    centroid matrix. Ties break to the LOWEST centroid id
    (``argmin`` first occurrence ≡ the oracle's ``ORDER BY dist,
    cid``)."""
    import numpy as np

    C = np.asarray(cents, dtype=np.int64)

    @F.pandas_udf("struct<cid:int,dist:long>")
    def _assign(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for vecs in it:
            if len(vecs) == 0:
                yield pd.DataFrame(
                    {
                        "cid": pd.Series([], dtype="int32"),
                        "dist": pd.Series([], dtype="int64"),
                    }
                )
                continue
            Q = np.stack([np.asarray(v, dtype=np.int64) for v in vecs])
            d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cid = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "cid": cid.astype("int32"),
                    "dist": d[np.arange(len(cid)), cid].astype("int64"),
                }
            )

    return _assign


def kmeans_assignments(
    emb: DataFrame,
    *,
    k: int = 8,
    rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    release_cache: bool = True,
) -> DataFrame:
    """Distributed Lloyd's k-means over int8-quantized embeddings,
    hash-EXACT across engines (pure int64 arithmetic end-to-end) —
    the semantic-clustering primitive behind cluster-balanced corpus
    curation (SemDeDup-style diversity sampling, per-cluster quality
    mixing).

    Unlike :func:`ivf_build_centroids` (k-means-lite on a bounded
    driver sample — an ANN routing heuristic), this fits on the FULL
    corpus distributively. Determinism pins every step: seeds are the
    ``k`` rows with the smallest ``(md5(vec_id), vec_id)`` (a bounded
    TakeOrderedAndProject, never a global sort), assignment ties break
    to the lowest centroid id, centroid updates are non-negative
    floor divisions, and empty clusters retain their previous
    centroid.

    Scale shape: per round, ONE zero-shuffle assignment pass (the
    k×dim centroid matrix is a closure constant — no join) + ONE
    uniform-key (cid, pos) aggregation with map-side combine whose
    output is exactly k·dim rows — the only rows that ever reach the
    driver, independent of corpus size. At 100 TB with k=1024,
    dim=1024 that is 1M rows per round; the quantized vectors are
    persisted once (eager count — AQE races lineage recompute
    otherwise) and rescanned per round.
    """
    q = emb.select(
        F.col(id_col).alias("vec_id"), quantized_shifted(vec_col).alias("q")
    ).persist()
    q.count()

    init = (
        q.select("vec_id", "q", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    cents = [list(r["q"]) for r in init]

    for _ in range(rounds):
        assigned = q.select(
            _kmeans_assign_factory(cents)(F.col("q")).alias("a"), "q"
        )
        upd = (
            assigned.select(
                F.col("a.cid").alias("cid"), F.posexplode("q").alias("pos", "val")
            )
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("cid", "pos", F.expr("s div n").alias("v"))
            .collect()
        )
        new_cents = [list(c) for c in cents]
        for r in upd:
            new_cents[r["cid"]][r["pos"]] = r["v"]
        cents = new_cents

    final = q.withColumn("a", _kmeans_assign_factory(cents)(F.col("q"))).select(
        "vec_id",
        F.col("a.cid").alias("centroid_id"),
        F.col("a.dist").alias("dist"),
    )
    if not release_cache:
        # plan-inspection seam: callers (test_plans) that assert the
        # zero-shuffle assignment plan need the REAL plan, which an
        # eager localCheckpoint would replace with a checkpoint-RDD
        # scan. They own q's cache lifetime.
        return final
    # cache release: the 3-scalar-column assignment is ~dim× smaller
    # than the quantized vectors — materialize it (cutting lineage
    # to q) and free q's cache instead of leaking it across a long
    # multi-query session.
    final = final.localCheckpoint(eager=True)
    q.unpersist()
    return final


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's ``//`` on
    integers truncates while Python's floors, and power-iteration
    components go negative, so the driver must match the oracle's
    semantics explicitly."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def top_principal_component(
    emb: DataFrame,
    *,
    iters: int = 8,
    norm_scale: int = 10**6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top principal direction of the embedding corpus by INTEGER-EXACT
    power iteration — the PCA primitive behind embedding whitening,
    OPQ-style rotation pre-passes, and drift monitoring (is today's
    batch pointing where yesterday's corpus pointed?).

    Exactness contract: the direction is defined over the int8-
    QUANTIZED vectors (the same deterministic quantization as
    :func:`kmeans_assignments` / embedding_quantize_int8, signed) and
    every arithmetic step is integer: the uncentered second-moment
    (Gram) matrix ``G = Σ q qᵀ`` in int64, then ``iters`` rounds of
    ``v ← trunc(G·v · S / max|G·v|)`` in arbitrary-precision Python
    ints with TRUNCATING division (DuckDB ``//`` truncates; Python
    ``//`` floors — see :func:`_tdiv`). Deterministic start ``v₀ =
    S·1``; a zero matrix fixes ``v`` (mirrored by the oracle's CASE).

    Scale shape: ONE distributed pass builds G — the (id, j, value)
    explode self-joined on id with map-side combine, output exactly
    dim² rows (dim=1024 ⇒ 1M rows) — and only those dim²-bounded rows
    reach the driver; the iteration itself is driver-side integer math
    over a dim-vector, independent of corpus size. Returns
    ``(dim_idx, component, eigen_est)`` where component is the
    S-scaled direction and eigen_est the integer Rayleigh quotient
    ``trunc(vᵀGv / vᵀv)``.
    """
    q = emb.select(
        F.col(id_col).alias("vid"), quantized_shifted(vec_col).alias("qs")
    )
    x = q.select(
        "vid", F.posexplode("qs").alias("j", "vs")
    ).select("vid", "j", (F.col("vs") - 127).alias("v"))
    a = x.select("vid", F.col("j"), F.col("v").alias("va"))
    b = x.select("vid", F.col("j").alias("k"), F.col("v").alias("vb"))
    gram_rows = (
        a.join(b, "vid")
        .filter(F.col("j") <= F.col("k"))
        .groupBy("j", "k")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("g"))
        .collect()  # dim²-bounded: the ONLY rows that reach the driver
    )
    if not gram_rows:
        dim = 0
    else:
        dim = max(r["k"] for r in gram_rows) + 1
    G = [[0] * dim for _ in range(dim)]
    for r in gram_rows:
        G[r["j"]][r["k"]] = r["g"]
        G[r["k"]][r["j"]] = r["g"]

    v = [norm_scale] * dim
    for _ in range(iters):
        w = [sum(G[j][k] * v[k] for k in range(dim)) for j in range(dim)]
        s = max((abs(x_) for x_ in w), default=0)
        if s == 0:
            break  # zero matrix: direction undefined, keep v (oracle CASE)
        v = [_tdiv(w[j] * norm_scale, s) for j in range(dim)]

    num = sum(G[j][k] * v[j] * v[k] for j in range(dim) for k in range(dim))
    den = sum(c * c for c in v)
    eig = _tdiv(num, den) if den else 0

    spark = emb.sparkSession
    return spark.createDataFrame(
        [(j, v[j], eig) for j in range(dim)],
        "dim_idx int, component bigint, eigen_est bigint",
    )


# ---------------------------------------------------------------------------
# Persisted IVF index: bucketed layout + partition-pruned probes
# ---------------------------------------------------------------------------


def write_ivf_index(
    emb: DataFrame,
    out_dir: str,
    *,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Materialize the IVF index the inline :func:`ivf_topk` docstring
    promises: vectors written ONCE to a Hive layout partitioned by
    ``centroid_id`` (`centroid_id=<c>/` directories), plus the centroid
    matrix as a single-row-group parquet sidecar (`_centroids/`). At
    100 TB this write is one assignment pass + one partitioned write;
    every later query prunes to nprobe/n_centroids of the files at the
    FileIndex level — the scan never lists, opens, or decodes the
    other cells. Returns the centroid matrix (as nested lists) for the
    caller's bookkeeping."""
    C = ivf_build_centroids(
        emb, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col
    )
    assigned = ivf_assign(emb, C, vec_col=vec_col)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{out_dir}/cells"
    )
    spark = emb.sparkSession
    cent_rows = [(i, [float(x) for x in row]) for i, row in enumerate(C)]
    spark.createDataFrame(
        cent_rows, "centroid_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/_centroids")
    return [list(map(float, row)) for row in C]


def ivf_topk_from_index(
    spark,
    index_dir: str,
    query_vec: Sequence[float],
    *,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Probe a persisted IVF index: load the (tiny) centroid sidecar,
    pick the ``nprobe`` nearest cells driver-side, and scan ONLY those
    partitions — the ``centroid_id IN (...)`` filter binds to the Hive
    partition column, so pruning happens in the file index (asserted in
    tests), not per-row. The exact cosine re-rank runs over the probed
    cells only, ending in a TakeOrderedAndProject."""
    import numpy as np

    cents = spark.read.parquet(f"{index_dir}/_centroids").collect()
    C = np.zeros((len(cents), len(cents[0]["centroid"])))
    for r in cents:
        C[r["centroid_id"]] = r["centroid"]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = [int(i) for i in np.argsort(-(C @ qn))[:nprobe]]
    cells = spark.read.parquet(f"{index_dir}/cells")
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cells.filter(F.col("centroid_id").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qlit), round_digits).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def append_to_ivf_index(
    spark,
    index_dir: str,
    new_emb: DataFrame,
    *,
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign NEW vectors with the
    STORED centroid sidecar (never refit — the cell layout and every
    earlier assignment stay valid) and append them to their cell
    partitions. Dynamic partition append touches only the cells that
    receive rows; probes pick up the new vectors with no rebuild. At
    100 TB this is the daily-ingest path: one assignment scan over the
    batch + an append write, cost proportional to the batch, not the
    index. Refit (a fresh :func:`write_ivf_index`) is only warranted
    when drift degrades cell balance."""
    import numpy as np

    cents = spark.read.parquet(f"{index_dir}/_centroids").collect()
    C = np.zeros((len(cents), len(cents[0]["centroid"])))
    for r in cents:
        C[r["centroid_id"]] = r["centroid"]
    assigned = ivf_assign(new_emb, C, vec_col=vec_col)
    assigned.write.mode("append").partitionBy("centroid_id").parquet(
        f"{index_dir}/cells"
    )


def compact_ivf_index(
    spark,
    index_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Index maintenance after sustained streaming appends: compact
    each cell directory's accreted small files
    (:func:`~hadoopxmlextractor_spark.sinks.compact_parquet` per
    cell — tmp-dir swap, so probes never see a half-written cell).
    The loop is over k cell DIRECTORIES (bounded by n_centroids,
    never data-sized); each cell rewrite is one independent job, so a
    scheduler can spread cells across a maintenance window. Returns
    {cell_path: (files_before, files_after)}.

    Cells are discovered through Spark's own partition discovery (a
    zero-data-column DISTINCT on the Hive partition column — the
    values come from the FileIndex directory listing), not a local
    ``os.listdir``, so the maintenance path works wherever the index
    lives: local FS, HDFS, or an object store."""
    from pyspark.errors import AnalysisException

    from hadoopxmlextractor_spark.sinks import compact_parquet

    cells_root = f"{index_dir}/cells"
    try:
        cell_ids = sorted(
            r["centroid_id"]
            for r in spark.read.parquet(cells_root)
            .select("centroid_id")
            .distinct()
            .collect()
        )
    except AnalysisException:
        # freshly created / fully pruned index: no parquet under cells
        # — nothing to compact (the old os.listdir loop's behavior)
        return {}
    out = {}
    for cid in cell_ids:
        entry = f"centroid_id={cid}"
        out[entry] = compact_parquet(
            spark, f"{cells_root}/{entry}", target_file_bytes=target_file_bytes
        )
    return out


def bitext_mutual_top1(
    pairs: DataFrame,
    *,
    parity_mod: int = 2,
    min_margin: float = 0.0,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    LASER/CCMatrix parallel-corpus miner): given symmetric near pairs
    ``(id_a, id_b, sim)`` over multilingual embeddings, keep the
    CROSS-SIDE pairs that are each other's best match (mutual top-1)
    and report how decisively each side wins (margin over the runner-
    up). Mining parallel sentences is the canonical bitext source for
    translation-training corpora; mutual-top-1 + margin is what
    separates true translations from topically-similar noise.

    Sides come from id parity (``id % parity_mod``: 0 = source
    language, else target) so no side table needs joining — in
    production the id encodes the shard/language anyway. Candidates
    come from the caller's LSH pair generator (never O(n²)); this
    operator adds two key-partitioned windows over the PAIR table
    (top-1 + runner-up per src and per dst in one pass each) and a
    filter — pair-table-sized work, no further joins, so it scales
    with candidate count, not corpus size.

    Margins subtract the ALREADY-ROUNDED sims (identical IEEE inputs
    on any engine), so the output replays exactly. A side with no
    runner-up gets margin = sim - 0.0 (maximally decisive).
    """
    # "source side" means parity 0; with parity_mod > 2 a pair of two
    # distinct NON-zero parities is still same-kind (target/target), so
    # the cross-side test is "exactly one side is 0", not sa != sb —
    # and orientation keys on WHICH side is 0.
    sa = (F.col("id_a") % parity_mod) == 0
    sb = (F.col("id_b") % parity_mod) == 0
    o = pairs.filter(sa != sb).select(
        F.when(sa, F.col("id_a")).otherwise(F.col("id_b")).alias("src"),
        F.when(sa, F.col("id_b")).otherwise(F.col("id_a")).alias("dst"),
        "sim",
    )
    ws = Window.partitionBy("src").orderBy(F.col("sim").desc(), "dst")
    wd = Window.partitionBy("dst").orderBy(F.col("sim").desc(), "src")
    ranked = o.select(
        "src",
        "dst",
        "sim",
        F.row_number().over(ws).alias("rs"),
        F.lead("sim", 1).over(ws).alias("second_s"),
        F.row_number().over(wd).alias("rd"),
        F.lead("sim", 1).over(wd).alias("second_d"),
    )
    out = ranked.filter((F.col("rs") == 1) & (F.col("rd") == 1)).select(
        "src",
        "dst",
        "sim",
        F.round(F.col("sim") - F.coalesce("second_s", F.lit(0.0)), 5).alias(
            "margin_src"
        ),
        F.round(F.col("sim") - F.coalesce("second_d", F.lit(0.0)), 5).alias(
            "margin_dst"
        ),
    )
    if min_margin > 0.0:
        out = out.filter(
            F.least("margin_src", "margin_dst") >= F.lit(min_margin)
        )
    return out


def maxsim_topk_multivector(
    emb: DataFrame,
    *,
    query_group: int = 0,
    group_size: int = 4,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Late-interaction multi-vector retrieval (ColBERT MaxSim,
    Khattab & Zaharia SIGIR'20): entities are GROUPS of token-vectors
    (here ``group = id div group_size`` — the multi-vector layout a
    real pipeline materializes per passage), and the score of a
    candidate group against the query group is
    ``Σ_{q ∈ query} max_{t ∈ candidate} cos(q, t)`` — each query
    vector independently finds its best-matching candidate vector, so
    partial/semantic matches score where single-pooled-vector cosine
    averages them away.

    Determinism discipline: each pair cosine rounds to
    ``round_digits`` and widens to DECIMAL(18,6) BEFORE the max/sum —
    max of decimals is order-free and the 4-term decimal sum is exact,
    so the score is bit-identical across engines and partitionings
    (a double sum would be one ulp away from SQL depending on
    reduction order). Final score casts to DOUBLE per the canonical
    output-type contract.

    Scale shape: the query group (group_size rows) broadcasts; the
    candidate side computes group_size cosines per vector in ONE
    Arrow-batched numpy kernel (:func:`cosine_pairs_udf` — JVM
    zip_with/aggregate lambdas are forbidden under joins, the 433 s
    pathology), then two uniform-key aggregates (per-(group, q) max,
    per-group sum) and a TakeOrderedAndProject. Cost is
    group_size × |corpus| kernel rows — linear in the corpus, never
    pairwise in groups.
    """
    v = emb.select(
        F.expr(f"{id_col} div {group_size}").alias("group_id"),
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
    )
    qside = v.filter(F.col("group_id") == query_group).select(
        F.col("vid").alias("q_id"), F.col("vec").alias("q_vec")
    )
    cand = v.filter(F.col("group_id") != query_group)
    kern = cosine_pairs_udf()
    scored = cand.crossJoin(F.broadcast(qside)).select(
        "group_id",
        "q_id",
        F.round(kern(F.col("vec"), F.col("q_vec")), round_digits)
        .cast("decimal(18,6)")
        .alias("sim"),
    )
    per_q = scored.groupBy("group_id", "q_id").agg(F.max("sim").alias("best"))
    return (
        per_q.groupBy("group_id")
        .agg(F.sum("best").cast("double").alias("maxsim"))
        .orderBy(F.col("maxsim").desc(), "group_id")
        .limit(k)
    )


def mmr_diversified_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    *,
    k: int = 10,
    pool: int = 50,
    lam_tenths: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98): select ``k`` results from the top-``pool`` cosine
    candidates, each round taking the candidate maximizing
    ``λ·sim(c, q) − (1−λ)·max_{s∈selected} sim(c, s)`` — the standard
    diversity pass that keeps a retrieved context set from being k
    copies of the same passage (exactly what near-dup-heavy training
    corpora produce under plain top-k).

    Determinism discipline: every cosine rounds to 6 digits, widens to
    DECIMAL(18,6), and scales to an INTEGER micro-sim (decimal × 1e6
    is exact); the MMR objective is then
    ``lam_tenths·sim_q − (10−lam_tenths)·max_sel`` in pure bigint
    arithmetic, ties to the lowest id — bit-identical across engines
    and replayable as unrolled SQL rounds.

    Scale shape: the candidate CUT is the distributed part — one
    TakeOrderedAndProject over the corpus (the :func:`cosine_topk_
    bruteforce` plan). The pool is a BOUNDED constant (50), so the
    pool×pool sim matrix is 2.5k rows computed in one broadcast
    self-join and the k-round greedy argmax runs driver-side over
    dimension-sized data — the same bounded-driver-loop contract as
    BPE's 1-row-per-round argmax. Returns (rank, vec_id, sim_q_micro,
    mmr_score) for the k selections in selection order.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = (
        emb.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            (F.round(cosine(F.col(vec_col), q), 6).cast("decimal(18,6)")
             * 1_000_000).cast("long").alias("sq"),
        )
        .orderBy(F.col("sq").desc(), "vid")
        .limit(pool)
        .persist()
    )
    cand.count()  # eager: feeds the pairwise join twice
    kern = cosine_pairs_udf()
    right = cand.select(
        F.col("vid").alias("vid_b"), F.col("vec").alias("vec_b")
    )
    pw_rows = (
        cand.crossJoin(F.broadcast(right))
        .filter(F.col("vid") != F.col("vid_b"))
        .select(
            "vid",
            "vid_b",
            (F.round(kern(F.col("vec"), F.col("vec_b")), 6)
             .cast("decimal(18,6)") * 1_000_000).cast("long").alias("s"),
        )
        .collect()
    )
    sq = {r["vid"]: r["sq"] for r in cand.select("vid", "sq").collect()}
    pw: dict = {}
    for r in pw_rows:
        pw[(r["vid"], r["vid_b"])] = r["s"]
    cand.unpersist()

    selected: list = []
    out_rows = []
    remaining = set(sq)
    lam_c = 10 - lam_tenths
    for rank in range(1, min(k, len(sq)) + 1):
        best = None
        for c in remaining:
            if selected:
                msel = max(pw[(c, s)] for s in selected)
            else:
                msel = 0
            score = lam_tenths * sq[c] - lam_c * msel
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        _, chosen, score = best
        selected.append(chosen)
        remaining.discard(chosen)
        out_rows.append((rank, chosen, sq[chosen], score))
    spark = emb.sparkSession
    return spark.createDataFrame(
        out_rows, "rank int, vec_id long, sim_q_micro long, mmr_score long"
    )


def semdedup_prune(
    emb: DataFrame,
    *,
    k: int = 8,
    rounds: int = 3,
    threshold_num: int = 9,
    threshold_den: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int = 10_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): semantic near-dup
    PRUNING where the clustering bounds the quadratic — pairwise
    cosine is computed only WITHIN each k-means cluster, never across
    the corpus, which is the published trick that makes embedding
    dedup tractable at web scale (cluster size ~N/k stays constant
    when k scales with the corpus).

    Determinism end-to-end: clustering is the hash-exact integer
    :func:`kmeans_assignments`; similarity is the exact integer cosine
    of the CENTERED int8 quantized vectors (s = q - 127), thresholded
    by cross-multiplication — ``den²·dot² ≥ num²·‖a‖²·‖b‖²`` with
    ``dot > 0`` — so no float comparison anywhere (dot ≤ dim·127² and
    the squared compare stays inside int64 for dim ≤ 512). The keep
    rule is the SemDeDup representative choice made total: within a
    similar pair, the member closer to its centroid survives
    (tie → lower id), i.e. a row is pruned iff SOME same-cluster row
    with strictly smaller (dist, id) is θ-similar to it.

    Scale: one posexplode to (cluster, pos, value) → self-join on
    (cluster, pos) → pair aggregation — the standard within-block
    all-pairs shape, bounded by the max cluster size. The
    ``max_cluster_size`` pre-flight (one tiny aggregate over the
    assignments) FAILS FAST with the offending cluster instead of
    launching a quadratic stage — the same budget-guard discipline as
    the exact n-gram join; the fix is raising k, which is how SemDeDup
    is meant to scale.

    Returns one row per vector: (vec_id, centroid_id, dist, kept).
    """
    # r15 opt (guide §5): emb feeds TWO consumers — the k-means
    # quantize pass and the pair stage's own quantize (sq) below.
    # Unpersisted, an expensive caller lineage (the sentence-semdedup
    # token explode + 16-way pivot) ran once per consumer. The cache
    # is unit-cardinality embedding rows; like x below, the session
    # owns the release (the returned plan reads it lazily).
    emb = emb.persist()
    emb.count()
    a = kmeans_assignments(
        emb, k=k, rounds=rounds, vec_col=vec_col, id_col=id_col
    )
    sizes = a.groupBy("centroid_id").count().filter(
        F.col("count") > max_cluster_size
    )
    over = sizes.collect()  # k rows max - bounded by design
    if over:
        worst = max(over, key=lambda r: r["count"])
        raise ValueError(
            f"semdedup cluster {worst['centroid_id']} holds "
            f"{worst['count']} vectors > max_cluster_size="
            f"{max_cluster_size}; raise k (cluster size ~N/k) or the "
            "budget - refusing to launch a quadratic pair stage"
        )

    sq = emb.select(
        F.col(id_col).alias("vec_id"), quantized_shifted(vec_col).alias("q")
    )
    x = (
        sq.select("vec_id", F.posexplode("q").alias("pos", "qv"))
        .select("vec_id", "pos", (F.col("qv") - F.lit(127)).alias("sval"))
        .join(a.select("vec_id", "centroid_id"), "vec_id")
    ).persist()
    x.count()  # feeds norms AND both pair sides (AQE cache-race rule)
    norms = x.groupBy("vec_id").agg(
        F.sum(F.col("sval") * F.col("sval")).alias("nrm")
    )
    xa = x.select(
        F.col("centroid_id").alias("cid"),
        F.col("pos"),
        F.col("vec_id").alias("va"),
        F.col("sval").alias("sa"),
    )
    xb = x.select(
        F.col("centroid_id").alias("cid"),
        F.col("pos"),
        F.col("vec_id").alias("vb"),
        F.col("sval").alias("sb"),
    )
    dots = (
        xa.join(xb, ["cid", "pos"])
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("va"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("vb"), F.col("nrm").alias("nb"))
    simp = (
        dots.join(na, "va")
        .join(nb, "vb")
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(threshold_den * threshold_den)
                * F.col("dot") * F.col("dot")
                >= F.lit(threshold_num * threshold_num)
                * F.col("na") * F.col("nb")
            )
        )
        .select("va", "vb")
    )
    da = a.select(
        F.col("vec_id").alias("va"),
        F.col("dist").alias("dist_a"),
    )
    db = a.select(
        F.col("vec_id").alias("vb"),
        F.col("dist").alias("dist_b"),
    )
    # the pair member farther from its centroid (tie: higher id) loses
    pruned = (
        simp.join(da, "va")
        .join(db, "vb")
        .select(
            F.when(
                (F.col("dist_a") < F.col("dist_b"))
                | (
                    (F.col("dist_a") == F.col("dist_b"))
                    & (F.col("va") < F.col("vb"))
                ),
                F.col("vb"),
            )
            .otherwise(F.col("va"))
            .alias("vec_id")
        )
        .distinct()
    )
    out = a.join(
        pruned.withColumn("_pruned", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id",
        "centroid_id",
        "dist",
        F.coalesce(~F.col("_pruned"), F.lit(True)).alias("kept"),
    )
    # x stays cached until the caller's action completes (it feeds
    # norms and both pair sides of the lazy plan); the session owns
    # the release, same as tfidf's tf cache.
    return out
