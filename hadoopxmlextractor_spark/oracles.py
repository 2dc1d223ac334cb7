"""DuckDB oracle SQL generators for the deterministic pipeline operators.

The MinHash / SimHash / winnowing operators are fully deterministic
(seeded permutation params, md5-derived ``hash64``), so their oracles
are expressible in ANSI-ish DuckDB SQL: the 64-bit hash is rebuilt from
``md5()`` hex output byte-by-byte, and the seeded constants are embedded
as literals by these generators. This upgrades the driver's check for
those queries from rows-only to full row/schema/value-hash matching.

Kept rows-only on purpose: HLL (``approx_count_distinct``), KLL
(``percentile_approx``), IVF (driver-side k-means sample) — approximate
by design — and the multimodal byte-histogram (binary unnesting in SQL
buys no signal the pytest golden doesn't already pin).
"""

from __future__ import annotations

from hadoopxmlextractor_spark.operators.dedup import _MERSENNE31, _minhash_params

# Byte i of the md5 digest from its hex string; the search string omits
# '0' so strpos returns 0 for it (1-based otherwise) — exactly the
# nibble value.
_NIBBLE = "strpos('123456789abcdef', substr({h}, {p}, 1))"


def _hex_byte(h: str, i: int) -> str:
    hi = _NIBBLE.format(h=h, p=2 * i + 1)
    lo = _NIBBLE.format(h=h, p=2 * i + 2)
    return f"({hi}*16 + {lo})"


def hash64_sql(h: str) -> str:
    """int64 little-endian of the first 8 bytes of an md5 hex column —
    identical to ``operators.text.hash64`` (verified byte-for-byte)."""
    b = [_hex_byte(h, i) for i in range(8)]
    return (
        f"((CASE WHEN {b[7]} < 128 THEN {b[7]} ELSE {b[7]} - 256 END) * 72057594037927936"
        f" + {b[6]} * 281474976710656 + {b[5]} * 1099511627776 + {b[4]} * 4294967296"
        f" + {b[3]} * 16777216 + {b[2]} * 65536 + {b[1]} * 256 + {b[0]})"
    )


# Word shingles identical to dedup._py_shingles (docs shorter than n
# words yield the whole text as one shingle); MIN() downstream makes
# list_distinct unnecessary.
_SHINGLE_CTES = """
tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL
), sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                      for i in generate_series(1, len(w) - 2)] END) AS s
  FROM tok
), hx AS (
  SELECT doc_id, (((%(h64)s) %% %(p)d) + %(p)d) %% %(p)d AS x
  FROM (SELECT doc_id, md5(s) AS hh FROM sh)
)
""" % {"h64": hash64_sql("hh"), "p": _MERSENNE31}


def minhash_signatures_oracle(num_sigs: int = 4, seed: int = 42) -> str:
    params = _minhash_params(64, seed)[:num_sigs]
    mins = ",\n           ".join(
        f"MIN(({a} * x + {b}) % {_MERSENNE31}) AS sig{j}"
        for j, (a, b) in enumerate(params)
    )
    empties = ", ".join(f"{_MERSENNE31} AS sig{j}" for j in range(num_sigs))
    return f"""
    WITH {_SHINGLE_CTES}
    SELECT doc_id AS doc, {mins}
    FROM hx GROUP BY doc_id
    UNION ALL
    SELECT doc_id AS doc, {empties} FROM documents WHERE text IS NULL
    """


def minhash_lsh_oracle(
    *, num_hashes: int = 64, bands: int = 32, threshold: float = 0.5, seed: int = 42
) -> str:
    rows_per_band = num_hashes // bands
    params = _minhash_params(num_hashes, seed)
    values = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(params))
    band_eq = " AND ".join(
        f"sa[{rows_per_band}*k + {r + 1}] = sb[{rows_per_band}*k + {r + 1}]"
        for r in range(rows_per_band)
    )
    return f"""
    WITH {_SHINGLE_CTES},
    params(j, a, b) AS (VALUES {values}),
    sigs AS (
      SELECT doc_id, list(m ORDER BY j) AS sig
      FROM (SELECT hx.doc_id, p.j, MIN((p.a * hx.x + p.b) % {_MERSENNE31}) AS m
            FROM hx CROSS JOIN params p GROUP BY hx.doc_id, p.j)
      GROUP BY doc_id
    ),
    scored AS (
      SELECT doc_a, doc_b,
             len(list_filter(range({num_hashes}), i -> sa[i+1] = sb[i+1]))
               / {float(num_hashes)} AS est_jaccard,
             len(list_filter(range({bands}), k -> {band_eq})) AS shared_bands
      FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
    )
    SELECT doc_a, doc_b, est_jaccard
    FROM scored WHERE shared_bands > 0 AND est_jaccard >= {threshold}
    """


def minhash_lsh_scoped_oracle(
    *,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
    seed: int = 42,
    scope_mod: int = 50,
) -> str:
    """Replay of the SCOPED LSH composition (near-dup candidates must
    share ≥1 band AND the (lang, source) scope): same signatures and
    banding as :func:`minhash_lsh_oracle`, with the scope joined on
    from ``documents`` and folded into the pair-join predicate — plus
    the planted evidence the vacuous-check rule requires: every
    ``scope_mod``-th doc is mirrored TWICE at identical text, once in
    the SAME scope (+1e6 — must pair with its original) and once in a
    ':mirror' source (+2e6 — must NOT pair with it), so both the
    match and the suppression branch of the scope predicate are
    provably live. Signatures are copied to the plants (identical
    text ⇒ identical signature ⇒ no recompute)."""
    rows_per_band = num_hashes // bands
    params = _minhash_params(num_hashes, seed)
    values = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(params))
    band_eq = " AND ".join(
        f"sa[{rows_per_band}*k + {r + 1}] = sb[{rows_per_band}*k + {r + 1}]"
        for r in range(rows_per_band)
    )
    return f"""
    WITH {_SHINGLE_CTES},
    params(j, a, b) AS (VALUES {values}),
    sigs0 AS (
      SELECT doc_id, list(m ORDER BY j) AS sig
      FROM (SELECT hx.doc_id, p.j, MIN((p.a * hx.x + p.b) % {_MERSENNE31}) AS m
            FROM hx CROSS JOIN params p GROUP BY hx.doc_id, p.j)
      GROUP BY doc_id
    ),
    scoped0 AS MATERIALIZED (
      SELECT s.doc_id, d.lang, d.source, s.sig
      FROM sigs0 s JOIN documents d USING (doc_id)
    ),
    scoped AS MATERIALIZED (
      SELECT doc_id, lang, source, sig FROM scoped0
      UNION ALL
      SELECT doc_id + 1000000, lang, source, sig
      FROM scoped0 WHERE doc_id % {scope_mod} = 0
      UNION ALL
      SELECT doc_id + 2000000, lang, source || ':mirror', sig
      FROM scoped0 WHERE doc_id % {scope_mod} = 0
    ),
    scored AS (
      SELECT doc_a, doc_b, lang, source,
             len(list_filter(range({num_hashes}), i -> sa[i+1] = sb[i+1]))
               / {float(num_hashes)} AS est_jaccard,
             len(list_filter(range({bands}), k -> {band_eq})) AS shared_bands
      FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.lang, a.source, a.sig AS sa, b.sig AS sb
            FROM scoped a JOIN scoped b
              ON a.doc_id < b.doc_id
             AND a.lang = b.lang AND a.source = b.source)
    )
    SELECT doc_a, doc_b, est_jaccard, lang, source
    FROM scored WHERE shared_bands > 0 AND est_jaccard >= {threshold}
    """


def _simhash_sims_prefix() -> str:
    """WITH-chain ending at ``sims`` (doc_id, sh BIGINT simhash) — the
    shared 64-lane SimHash replay used by both the near-pair oracle
    and the bucket-histogram oracle."""
    lanes = ", ".join(
        f"({l}, {1 << l}::HUGEINT, "
        + (str(1 << l) if l < 63 else "(-9223372036854775807 - 1)")
        + ")"
        for l in range(64)
    )
    return f"""
    WITH th AS (
      SELECT doc_id, {hash64_sql('hh')} AS h
      FROM (SELECT doc_id, md5(t) AS hh
            FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
                  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''))
    ),
    tu AS (
      SELECT doc_id,
             CAST(h AS HUGEINT)
             + CASE WHEN h < 0 THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS u
      FROM th
    ),
    lanes(l, d, wt) AS (VALUES {lanes}),
    votes AS (
      SELECT doc_id, l, wt,
             SUM(CASE WHEN (u // d) % 2 = 1 THEN 1 ELSE -1 END) AS v
      FROM tu CROSS JOIN lanes GROUP BY doc_id, l, wt
    ),
    sims AS (
      SELECT d.doc_id, COALESCE(s.sh, 0) AS sh
      FROM documents d LEFT JOIN (
        SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN wt ELSE 0 END) AS BIGINT) AS sh
        FROM votes GROUP BY doc_id
      ) s USING (doc_id)
    )"""


def simhash_oracle(*, max_hamming: int = 7) -> str:
    return (
        _simhash_sims_prefix()
        + f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """
    )


def simhash_bucket_histogram_oracle(*, min_size: int = 2) -> str:
    """Replay of the SimHash LSH bucket histogram: the 8×8-bit
    pigeonhole chunks of every document's simhash, grouped to
    (chunk_idx, chunk_val) bucket sizes and candidate-pair loads —
    the observability surface behind simhash_near_pairs' max_bucket
    cap. Unsigned chunk extraction goes through the same HUGEINT
    two's-complement lift as the vote fold."""
    divisors = ", ".join(f"({k}, {1 << (8 * k)})" for k in range(8))
    return (
        _simhash_sims_prefix()
        + f""",
    su AS (
      SELECT doc_id,
             CAST(sh AS HUGEINT)
             + CASE WHEN sh < 0 THEN 18446744073709551616::HUGEINT
                    ELSE 0::HUGEINT END AS u
      FROM sims
    ),
    chunkdiv(k, d) AS (VALUES {divisors}),
    chunks AS (
      SELECT CAST(c.k AS INT) AS chunk_idx,
             CAST((su.u // c.d) % 256 AS INT) AS chunk_val
      FROM su CROSS JOIN chunkdiv c
    )
    SELECT chunk_idx, chunk_val,
           CAST(COUNT(*) AS BIGINT) AS bucket_size,
           CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS n_candidate_pairs
    FROM chunks GROUP BY chunk_idx, chunk_val
    HAVING COUNT(*) >= {min_size}
    """
    )


def prefix_filter_oracle(*, pct: int = 50) -> str:
    """Replay of dedup.prefix_filter_jaccard_pairs: same 64-bit shingle
    hashes, same (df ASC, hash ASC) total order, same integer prefix
    cut ``n - ((pct·n + 99) // 100) + 1`` (DuckDB ``//`` floors on
    non-negative operands exactly like Spark ``div``), same length
    filter and integer cross-multiplied Jaccard verify — so the oracle
    re-derives the exact pair set through the identical pruning path,
    not just the same final predicate. ``hx`` is MATERIALIZED: four
    downstream CTEs reference it and DuckDB inlines non-recursive CTEs
    per reference (the md5+hash64 scan would otherwise run 4x)."""
    return f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)] END) AS s
      FROM tok
    ), hx AS MATERIALIZED (
      SELECT DISTINCT doc_id, {hash64_sql('hh')} AS x
      FROM (SELECT doc_id, md5(s) AS hh FROM sh)
    ), sz AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hx GROUP BY doc_id
    ), dfq AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS df FROM hx GROUP BY x
    ), ranked AS (
      SELECT h.doc_id, h.x, s.n_sh,
             ROW_NUMBER() OVER (PARTITION BY h.doc_id ORDER BY d.df, h.x)
               AS pos
      FROM hx h JOIN dfq d USING (x) JOIN sz s USING (doc_id)
    ), prefix AS (
      SELECT doc_id, x, n_sh FROM ranked
      WHERE pos <= n_sh - (({pct} * n_sh + 99) // 100) + 1
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b ON a.x = b.x AND a.doc_id < b.doc_id
      WHERE 100 * LEAST(a.n_sh, b.n_sh) >= {pct} * GREATEST(a.n_sh, b.n_sh)
    ), ls AS (
      SELECT doc_id, list(x) AS hs, CAST(COUNT(*) AS BIGINT) AS n_sh
      FROM hx GROUP BY doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(la.hs, lb.hs)) AS BIGINT) AS shared,
           ROUND(len(list_intersect(la.hs, lb.hs))::DOUBLE
                 / (la.n_sh + lb.n_sh
                    - len(list_intersect(la.hs, lb.hs))), 4) AS jaccard
    FROM cand c
    JOIN ls la ON la.doc_id = c.doc_a
    JOIN ls lb ON lb.doc_id = c.doc_b
    WHERE 100 * len(list_intersect(la.hs, lb.hs)) >=
          {pct} * (la.n_sh + lb.n_sh - len(list_intersect(la.hs, lb.hs)))
    """


def ngram_novelty_oracle() -> str:
    """Replay of pipeline_queries.text_ngram_novelty with the document
    frequency counted over the SAME 64-bit shingle hashes the Spark side
    uses (hash64 of md5, rebuilt byte-by-byte) — not over literal text
    shingles, so exactness is the repo's replay convention rather than
    an injectivity assumption about hash64 (a collision between two
    distinct shingles now merges df identically on both engines)."""
    return f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)] END) AS s
      FROM tok
    ), hx AS (
      SELECT DISTINCT doc_id, {hash64_sql('hh')} AS x
      FROM (SELECT doc_id, md5(s) AS hh FROM sh)
    ), df AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS df FROM hx GROUP BY x
    )
    SELECT h.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           ROUND(CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS novelty
    FROM hx h JOIN df d USING (x)
    GROUP BY h.doc_id
    """


def winnowing_oracle(*, k: int = 5, window: int = 4) -> str:
    return f"""
    WITH base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS INT) AS n_bpe
      FROM documents WHERE text IS NOT NULL
    ), gl AS (
      SELECT doc_id, len(w) - {k - 1} AS nk,
             [array_to_string(w[i:i+{k - 1}], ' ')
              for i in generate_series(1, len(w) - {k - 1})] AS gs
      FROM base
    ), kg AS (
      SELECT doc_id, nk, unnest(gs) AS g, generate_subscripts(gs, 1) AS pos FROM gl
    ), kh AS (
      SELECT doc_id, nk, pos, {hash64_sql('hh')} AS h
      FROM (SELECT doc_id, nk, pos, md5(g) AS hh FROM kg)
    ), wins AS (
      SELECT doc_id, nk, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS wmin
      FROM kh
    ), counts AS (
      SELECT doc_id, COUNT(DISTINCT wmin) AS nf
      FROM wins WHERE pos <= nk - {window - 1} GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(CASE WHEN len(b.w) - {k - 1} <= 0 THEN 0
                     WHEN len(b.w) - {k - 1} < {window} THEN 1
                     ELSE c.nf END AS INT) AS n_fingerprints,
           b.n_bpe AS n_bpe_tokens
    FROM base b LEFT JOIN counts c USING (doc_id)
    """


def _lsh_pair_ctes(
    *, dim: int, n_planes: int, n_tables: int, seed: int,
    max_bucket: int = 10000,
) -> str:
    """Shared CTE chain rebuilding the seeded banded hyperplane sketch
    and the same-bucket-in-any-table candidate pairs (used by the
    near-pairs oracle and the semantic-cluster oracle so both replay
    the identical bucketing). Plane k belongs to table k // b, bit
    k % b — exactly `similarity.hyperplane_sketch`'s reshape."""
    from hadoopxmlextractor_spark.operators.similarity import _hyperplanes

    total = n_planes * n_tables
    planes = _hyperplanes(dim, total, seed)
    values = ", ".join(
        f"({k}, {i}, {float(planes[k, i])!r})"
        for k in range(total)
        for i in range(dim)
    )
    return f"""planes(k, i, wt) AS (VALUES {values}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    dots AS (
      SELECT v.vec_id, p.k, SUM(p.wt * v.e[p.i + 1]) AS d
      FROM v CROSS JOIN planes p GROUP BY v.vec_id, p.k
    ),
    sk AS (
      SELECT vec_id, k // {n_planes} AS t,
             SUM(CASE WHEN d > 0 THEN (1::BIGINT << (k % {n_planes})) ELSE 0 END)
               AS bucket
      FROM dots GROUP BY vec_id, k // {n_planes}
    ),
    skf AS (
      SELECT s.vec_id, s.t, s.bucket FROM sk s
      JOIN (SELECT t, bucket FROM sk GROUP BY t, bucket
            HAVING COUNT(*) <= {max_bucket}) ok
        ON s.t = ok.t AND s.bucket = ok.bucket
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM skf a JOIN skf b
        ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    pairs AS (
      SELECT id_a, id_b,
             ROUND(list_cosine_similarity(va.e, vb.e), 5) AS sim
      FROM cand
      JOIN v va ON va.vec_id = id_a
      JOIN v vb ON vb.vec_id = id_b
      WHERE ROUND(list_cosine_similarity(va.e, vb.e), 5) >= {{threshold}}
    )"""


def near_pairs_lsh_oracle(
    *,
    threshold: float = 0.45,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    max_bucket: int = 10000,
) -> str:
    """Banded hyperplane-LSH near pairs. The plane matrix is the
    operator's own seeded RandomState draw, embedded as full-precision
    literals; sign agreement on all of one table's planes = same
    bucket, candidate = collision in any table. FP caveat: the SQL dot
    is a sequential SUM while numpy's is pairwise — a sign could differ
    only if |dot| were within ~1e-13 of zero (never observed;
    probability ~1e-12 per vector-plane)."""
    ctes = _lsh_pair_ctes(
        dim=dim, n_planes=n_planes, n_tables=n_tables, seed=seed,
        max_bucket=max_bucket,
    ).format(threshold=threshold)
    return f"""
    WITH {ctes}
    SELECT id_a, id_b, sim FROM pairs
    """


def semantic_clusters_lsh_oracle(
    *,
    threshold: float = 0.45,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    max_bucket: int = 10000,
) -> str:
    """Connected components over the SAME seeded LSH candidate pairs the
    production `dedup_semantic_clusters` query generates (bucketing is
    deterministic, so the cluster assignment is exactly replayable)."""
    ctes = _lsh_pair_ctes(
        dim=dim, n_planes=n_planes, n_tables=n_tables, seed=seed,
        max_bucket=max_bucket,
    ).format(threshold=threshold)
    return f"""
    WITH RECURSIVE {ctes},
    edges AS (
      SELECT id_a AS x, id_b AS y FROM pairs
      UNION
      SELECT id_b AS x, id_a AS y FROM pairs
    ),
    reach(x, y) AS (
      SELECT x, x FROM (SELECT DISTINCT x FROM edges)
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    )
    SELECT x AS vec_id, MIN(y) AS component_id, (x = MIN(y)) AS is_canonical
    FROM reach GROUP BY x
    """


def minhash_incremental_oracle(
    *,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
    seed: int = 42,
    incoming_pct: int = 20,
) -> str:
    """Exact replay of ``minhash_incremental_flags`` over the md5-bucket
    incoming split: same seeded permutation minima, same raw-slice band
    agreement, same signature-agreement estimate, first-wins in-batch
    flags."""
    rows_per_band = num_hashes // bands
    params = _minhash_params(num_hashes, seed)
    values = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(params))
    band_eq = " AND ".join(
        f"sa[{rows_per_band}*k + {r + 1}] = sb[{rows_per_band}*k + {r + 1}]"
        for r in range(rows_per_band)
    )
    hex8 = (
        f"({_hex_byte('hh', 0)} * 16777216 + {_hex_byte('hh', 1)} * 65536"
        f" + {_hex_byte('hh', 2)} * 256 + {_hex_byte('hh', 3)})"
    )
    return f"""
    WITH {_SHINGLE_CTES},
    params(j, a, b) AS (VALUES {values}),
    sigs AS (
      SELECT doc_id, list(m ORDER BY j) AS sig
      FROM (SELECT hx.doc_id, p.j, MIN((p.a * hx.x + p.b) % {_MERSENNE31}) AS m
            FROM hx CROSS JOIN params p GROUP BY hx.doc_id, p.j)
      GROUP BY doc_id
    ),
    tagged AS (
      SELECT s.doc_id, s.sig,
             {hex8} % 100 >= {100 - incoming_pct} AS incoming
      FROM sigs s JOIN (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh
                        FROM documents) h USING (doc_id)
    ),
    scored AS (
      SELECT doc_a, inc_b,
             len(list_filter(range({num_hashes}), i -> sa[i+1] = sb[i+1]))
               / {float(num_hashes)} AS est,
             len(list_filter(range({bands}), k -> {band_eq})) AS shared_bands
      FROM (SELECT a.doc_id AS doc_a, b.incoming AS inc_b,
                   a.sig AS sa, b.sig AS sb
            FROM tagged a JOIN tagged b
              ON a.incoming AND a.doc_id <> b.doc_id
                 AND (NOT b.incoming OR b.doc_id < a.doc_id))
    ),
    hits AS (
      SELECT doc_a,
             bool_or(NOT inc_b) AS corpus_hit,
             bool_or(inc_b) AS batch_hit
      FROM scored WHERE shared_bands > 0 AND est >= {threshold}
      GROUP BY doc_a
    )
    SELECT t.doc_id AS doc,
           COALESCE(h.corpus_hit, false) AS near_dup_of_corpus,
           COALESCE(h.batch_hit, false) AS near_dup_in_batch
    FROM tagged t LEFT JOIN hits h ON t.doc_id = h.doc_a
    WHERE t.incoming
    """


def bpe_merges_oracle(rounds: int = 6) -> str:
    """Exact replay of operators.corpus.bpe_learn_merges: per round,
    pair stats per adjacent position weighted by word freq, argmax
    with (cnt DESC, pair ASC) tie-break, then greedy left-to-right
    application — replayed as a recursive CTE that replaces the
    LEFTMOST occurrence until none remains (provably the same result
    as the positional greedy merge: a merged symbol contains no
    space, so it can never re-match the pair pattern). The chosen
    pair flows between rounds via scalar subqueries, so the single
    SQL statement replays the whole training loop."""
    ctes = _bpe_ctes(rounds, final_apply=False)
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS rank,"
        f" (SELECT l FROM best{k}) AS left_sym,"
        f" (SELECT r FROM best{k}) AS right_sym,"
        f" (SELECT replace(pair, ' ', '') FROM best{k}) AS merged,"
        f" CAST((SELECT cnt FROM best{k}) AS BIGINT) AS pair_count"
        for k in range(rounds)
    )
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + rows


def bpe_encoded_words_oracle(rounds: int = 6) -> str:
    """Replay of operators.corpus.bpe_encoded_words: the word table
    after ALL learned merges are applied, exploded to (word, freq,
    pos, sym). Shares the training CTE chain with
    :func:`bpe_merges_oracle` plus the final round's application."""
    ctes = _bpe_ctes(rounds, final_apply=True)
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f"""
SELECT word, freq, CAST(pos AS INT) - 1 AS pos, sym FROM (
  SELECT word, freq,
         unnest(regexp_split_to_array(trim(s), ' ')) AS sym,
         unnest(generate_series(1, len(regexp_split_to_array(trim(s), ' ')))) AS pos
  FROM words{rounds})"""
    )


def _bpe_ctes(rounds: int, *, final_apply: bool) -> list[str]:
    pat = "(SELECT ' ' || pair || ' ' FROM best{k})"
    ctes = [
        r"""words0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         ' ' || array_to_string(
           [word[i] for i in generate_series(1, len(word))], ' ') || ' ' AS s
  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        FROM documents WHERE trim(text) <> '')
  WHERE word <> ''
  GROUP BY word
)"""
    ]
    for k in range(rounds):
        p = pat.format(k=k)
        ctes.append(
            f"""stats{k} AS MATERIALIZED (
  SELECT pair, SUM(freq) AS cnt FROM (
    SELECT w.freq,
           unnest([l[i] || ' ' || l[i+1]
                   for i in generate_series(1, len(l) - 1)]) AS pair
    FROM (SELECT freq, regexp_split_to_array(trim(s), ' ') AS l
          FROM words{k}) w(freq, l)
  ) GROUP BY pair
), best{k} AS MATERIALIZED (
  SELECT pair, split_part(pair, ' ', 1) AS l,
         split_part(pair, ' ', 2) AS r, cnt
  FROM stats{k} ORDER BY cnt DESC, pair ASC LIMIT 1
)"""
        )
        if final_apply or k < rounds - 1:
            ctes.append(
                f"""apply{k} AS (
  SELECT word, freq, s FROM words{k}
  UNION ALL
  SELECT word, freq,
         substr(s, 1, instr(s, {p}) - 1)
         || ' ' || (SELECT replace(pair, ' ', '') FROM best{k}) || ' '
         || substr(s, instr(s, {p}) + length({p}))
  FROM apply{k}
  WHERE instr(s, {p}) > 0
), words{k + 1} AS MATERIALIZED (
  SELECT word, freq, s FROM apply{k} WHERE instr(s, {p}) = 0
)"""
            )
    return ctes


def image_ahash_oracle(*, side: int = 8) -> str:
    """Replay of operators.multimodal.image_ahash over synth_ppm_media:
    the oracle regenerates the pixel plane from the md5 chain (byte j
    of chunk k = hex pair j of md5('{doc_id}:{k}')) instead of parsing
    the PPM container, then runs the identical integer luminance /
    mean-threshold / row-major bit packing. Bit 63 lands as the int64
    sign bit via a signed lane weight (same trick as simhash_oracle)."""
    n_px = side * side
    n_bytes = n_px * 3
    n_chunks = (n_bytes + 15) // 16
    lanes = ", ".join(
        f"({l}, " + (str(1 << l) if l < 63 else "(-9223372036854775807 - 1)") + ")"
        for l in range(n_px)
    )
    return f"""
    WITH b AS (
      SELECT doc_id, (k * 16 + j) AS idx,
             CAST(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
               j * 2 + 1, 2)) AS BIGINT) AS v
      FROM documents,
           (SELECT unnest(range({n_chunks})) AS k),
           (SELECT unnest(range(16)) AS j)
      WHERE k * 16 + j < {n_bytes}
    ),
    px AS (
      SELECT doc_id, idx // 3 AS p,
             SUM(CASE idx % 3 WHEN 0 THEN v * 299
                             WHEN 1 THEN v * 587
                             ELSE v * 114 END) AS num
      FROM b GROUP BY doc_id, idx // 3
    ),
    lum AS (SELECT doc_id, p, num // 1000 AS g FROM px),
    mean AS (SELECT doc_id, SUM(g) // {n_px} AS m FROM lum GROUP BY doc_id),
    lanes(l, wt) AS (VALUES {lanes})
    SELECT lum.doc_id AS media_id,
           CAST(SUM(CASE WHEN g > m THEN wt ELSE 0 END) AS BIGINT) AS ahash
    FROM lum JOIN mean USING (doc_id) JOIN lanes ON lanes.l = lum.p
    GROUP BY lum.doc_id
    """


def image_ahash_lowbit_oracle(*, side: int = 8) -> str:
    """Replay of image_ahash over synth_png_lowbit_media: the gray
    sample of pixel p is md5 byte p (salt ':pnglb') quantized to the
    doc's bit depth — v = byte // 2^(8−d), presented as v·(255/(2^d−1))
    — with depth rotating 1/2/4 by doc_id % 3. Gray r=g=b collapses
    the 299/587/114 luminance to the sample itself, so the oracle is
    pure quantization arithmetic; any fault in packed-bit unpack,
    byte-unit filtering, Adam7 pass geometry (every 5th doc), or the
    scale presentation flips the hash."""
    n_px = side * side
    n_chunks = (n_px + 15) // 16
    lanes = ", ".join(
        f"({l}, " + (str(1 << l) if l < 63 else "(-9223372036854775807 - 1)") + ")"
        for l in range(n_px)
    )
    return f"""
    WITH d AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS dep
      FROM documents
    ),
    lum AS (
      SELECT d.doc_id, (k * 16 + j) AS p,
             (CAST(('0x' || substring(
               md5(CAST(d.doc_id AS VARCHAR) || ':pnglb'
                   || CAST(k AS VARCHAR)),
               j * 2 + 1, 2)) AS BIGINT) // CAST(2 ** (8 - dep) AS BIGINT))
             * (255 // (CAST(2 ** dep AS BIGINT) - 1)) AS g
      FROM d,
           (SELECT unnest(range({n_chunks})) AS k),
           (SELECT unnest(range(16)) AS j)
      WHERE k * 16 + j < {n_px}
    ),
    mean AS (SELECT doc_id, SUM(g) // {n_px} AS m FROM lum GROUP BY doc_id),
    lanes(l, wt) AS (VALUES {lanes})
    SELECT lum.doc_id AS media_id,
           CAST(SUM(CASE WHEN g > m THEN wt ELSE 0 END) AS BIGINT) AS ahash
    FROM lum JOIN mean USING (doc_id) JOIN lanes ON lanes.l = lum.p
    GROUP BY lum.doc_id
    """


def image_ahash_gray_oracle(*, salt: str, side: int = 8) -> str:
    """aHash replay for a GRAY md5 plane whose presented byte p is
    exactly md5 hex pair p of ``md5(doc_id || salt || chunk)`` —
    r=g=b collapses the 299/587/114 luminance to the byte itself.
    Shared by the lossless-codec queries (lossless ⇒ the decoded
    plane IS the synth arithmetic; the oracle never models the
    codec)."""
    n_px = side * side
    n_chunks = (n_px + 15) // 16
    lanes = ", ".join(
        f"({l}, " + (str(1 << l) if l < 63 else "(-9223372036854775807 - 1)") + ")"
        for l in range(n_px)
    )
    return f"""
    WITH lum AS (
      SELECT doc_id, (k * 16 + j) AS p,
             CAST(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || '{salt}'
                   || CAST(k AS VARCHAR)),
               j * 2 + 1, 2)) AS BIGINT) AS g
      FROM documents,
           (SELECT unnest(range({n_chunks})) AS k),
           (SELECT unnest(range(16)) AS j)
      WHERE k * 16 + j < {n_px}
    ),
    mean AS (SELECT doc_id, SUM(g) // {n_px} AS m FROM lum GROUP BY doc_id),
    lanes(l, wt) AS (VALUES {lanes})
    SELECT lum.doc_id AS media_id,
           CAST(SUM(CASE WHEN g > m THEN wt ELSE 0 END) AS BIGINT) AS ahash
    FROM lum JOIN mean USING (doc_id) JOIN lanes ON lanes.l = lum.p
    GROUP BY lum.doc_id
    """


def audio_energy_oracle(
    *, n_samples: int = 256, window: int = 64,
    silence_threshold: int = 22_000_000_000,
) -> str:
    """Replay of operators.multimodal.audio_energy_windows over
    synth_wav_media: samples regenerated from the md5 chain (bytes
    2s, 2s+1 of the stream = little-endian int16 of sample s), then
    the identical integer sum-of-squares per non-overlapping frame."""
    n_bytes = n_samples * 2
    n_chunks = (n_bytes + 15) // 16
    return f"""
    WITH b AS (
      SELECT doc_id, (k * 16 + j) AS idx,
             CAST(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':w' || CAST(k AS VARCHAR)),
               j * 2 + 1, 2)) AS BIGINT) AS v
      FROM documents,
           (SELECT unnest(range({n_chunks})) AS k),
           (SELECT unnest(range(16)) AS j)
      WHERE k * 16 + j < {n_bytes}
    ),
    samples AS (
      SELECT doc_id, idx // 2 AS s,
             SUM(CASE idx % 2 WHEN 0 THEN v ELSE 256 * v END) AS raw
      FROM b GROUP BY doc_id, idx // 2
    ),
    pcm AS (
      SELECT doc_id, s,
             CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS x
      FROM samples
    )
    SELECT doc_id AS media_id, CAST(s // {window} AS INT) AS win_idx,
           CAST(SUM(x * x) AS BIGINT) AS energy,
           (SUM(x * x) < {silence_threshold}) AS is_silence
    FROM pcm GROUP BY doc_id, s // {window}
    """


def audio_g711_oracle(
    *, n_samples: int = 256, window: int = 64,
    silence_threshold: int = 6_500_000_000,
) -> str:
    """Replay of audio_energy_windows over synth_g711_wav_media: one
    md5 byte per sample, expanded to int16 by G.711 companding written
    DIRECTLY as SQL bit arithmetic (ITU G.711 segment expansion —
    independent of the table the decoder builds, so the oracle proves
    the table, not itself): μ-law for even doc_ids, A-law for odd,
    then the identical integer sum-of-squares per frame. Threshold
    sits at the measured median window energy, so is_silence genuinely
    discriminates (~50/50)."""
    n_chunks = (n_samples + 15) // 16
    # u-law (format 7): u = ~code; t = (((u&15)<<3)+132) << ((u>>4)&7);
    # x = 132-t if sign else t-132
    u = "(255 - code)"
    ut = f"((((({u}) & 15) * 8) + 132) << ((({u}) >> 4) & 7))"
    ux = f"(CASE WHEN (({u}) & 128) <> 0 THEN 132 - {ut} ELSE {ut} - 132 END)"
    # A-law (format 6): a = code ^ 0x55; seg expansion; sign-set = positive
    a = "xor(code, 85)"
    aseg = f"((({a}) >> 4) & 7)"
    at0 = f"((({a}) & 15) * 16)"
    at = (
        f"(CASE WHEN {aseg} = 0 THEN {at0} + 8 "
        f"WHEN {aseg} = 1 THEN {at0} + 264 "
        f"ELSE ({at0} + 264) << ({aseg} - 1) END)"
    )
    ax = f"(CASE WHEN (({a}) & 128) <> 0 THEN {at} ELSE -{at} END)"
    return f"""
    WITH b AS (
      SELECT doc_id, (k * 16 + j) AS s,
             CAST(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':g' || CAST(k AS VARCHAR)),
               j * 2 + 1, 2)) AS BIGINT) AS code
      FROM documents,
           (SELECT unnest(range({n_chunks})) AS k),
           (SELECT unnest(range(16)) AS j)
      WHERE k * 16 + j < {n_samples}
    ),
    xs AS (
      SELECT doc_id, s,
             CASE WHEN doc_id % 2 = 0 THEN {ux} ELSE {ax} END AS x
      FROM b
    )
    SELECT doc_id AS media_id, CAST(s // {window} AS INT) AS win_idx,
           CAST(SUM(x * x) AS BIGINT) AS energy,
           (SUM(x * x) < {silence_threshold}) AS is_silence
    FROM xs GROUP BY doc_id, s // {window}
    """


def audio_adpcm_oracle(
    *, window: int = 64, silence_threshold: int = 43_000_000_000,
    n_nibble_bytes: int = 128,
) -> str:
    """Replay of audio_energy_windows over synth_adpcm_wav_media: the
    SEQUENTIAL IMA ADPCM state machine (step table, vpdiff
    accumulation, int16 clamp, index walk) re-derived as a RECURSIVE
    CTE carrying (pred, index) per doc per nibble — the first
    compressed-audio oracle, same exact-replay discipline as the
    lossy-JPEG DC identity. Uses the first ``(2n+1) // window`` full
    windows (256 samples for the default block)."""
    n_chunks = (n_nibble_bytes + 15) // 16
    n_samples_used = ((2 * n_nibble_bytes + 1) // window) * window
    steps = ", ".join(f"({i}, {s})" for i, s in enumerate([
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ]))
    vp = (
        "((st // 8)"
        " + CASE WHEN (nib.nb & 4) <> 0 THEN st ELSE 0 END"
        " + CASE WHEN (nib.nb & 2) <> 0 THEN st // 2 ELSE 0 END"
        " + CASE WHEN (nib.nb & 1) <> 0 THEN st // 4 ELSE 0 END)"
    )
    return f"""
    WITH RECURSIVE
    step_tab(i, st) AS (VALUES {steps}),
    hdr AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':adpcmh'), 1, 2)) AS BIGINT)
             + 256 * CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':adpcmh'), 3, 2)) AS BIGINT)
               AS raw16,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':adpcmh'), 5, 2)) AS BIGINT)
               % 89 AS idx0
      FROM documents
    ),
    hdr2 AS (
      SELECT doc_id,
             CASE WHEN raw16 >= 32768 THEN raw16 - 65536 ELSE raw16 END
               AS pred0,
             idx0
      FROM hdr
    ),
    nib AS (
      SELECT doc_id, (j * 2 + half) AS s,
             CASE half WHEN 0 THEN v % 16 ELSE v // 16 END AS nb
      FROM (
        SELECT doc_id, (k * 16 + jj) AS j,
               CAST(('0x' || substring(
                 md5(CAST(doc_id AS VARCHAR) || ':adpcm'
                     || CAST(k AS VARCHAR)),
                 jj * 2 + 1, 2)) AS BIGINT) AS v
        FROM documents,
             (SELECT unnest(range({n_chunks})) AS k),
             (SELECT unnest(range(16)) AS jj)
        WHERE k * 16 + jj < {n_nibble_bytes}
      ), (VALUES (0), (1)) h(half)
    ),
    walk AS (
      SELECT doc_id, -1 AS s, pred0 AS pred, idx0 AS idx FROM hdr2
      UNION ALL
      SELECT w.doc_id, w.s + 1,
             GREATEST(-32768, LEAST(32767,
               w.pred + (CASE WHEN (nib.nb & 8) <> 0 THEN -1 ELSE 1 END)
                        * {vp})),
             GREATEST(0, LEAST(88,
               w.idx + CASE WHEN (nib.nb & 7) < 4 THEN -1
                            ELSE 2 * (nib.nb & 7) - 6 END))
      FROM walk w
      JOIN nib ON nib.doc_id = w.doc_id AND nib.s = w.s + 1
      JOIN step_tab ON step_tab.i = w.idx
      WHERE w.s < {n_samples_used - 2}
    ),
    samples AS (
      SELECT doc_id, s + 1 AS n, pred AS x FROM walk
    )
    SELECT doc_id AS media_id, CAST(n // {window} AS INT) AS win_idx,
           CAST(SUM(x * x) AS BIGINT) AS energy,
           (SUM(x * x) < {silence_threshold}) AS is_silence
    FROM samples GROUP BY doc_id, n // {window}
    """


def video_shots_oracle(
    *, n_frames: int = 8, side: int = 8, hamming_threshold: int = 16
) -> str:
    """Replay of operators.multimodal.video_shot_boundaries over
    synth_ppm_video (cuts at 0/3/6): per frame the pixel chunks are
    regenerated with the closed-form generation rule, hashed with the
    same integer aHash as image_ahash_oracle, then the consecutive-
    frame hamming window."""
    n_px = side * side
    n_bytes = n_px * 3
    n_chunks = (n_bytes + 15) // 16
    lanes = ", ".join(
        f"({l}, " + (str(1 << l) if l < 63 else "(-9223372036854775807 - 1)") + ")"
        for l in range(n_px)
    )
    scene = "CASE WHEN f.f >= 6 THEN 6 WHEN f.f >= 3 THEN 3 ELSE 0 END"
    gen = (
        f"CASE WHEN ch.k > ({scene}) AND ch.k <= f.f THEN ch.k "
        f"ELSE ({scene}) END"
    )
    return f"""
    WITH f AS (SELECT unnest(range({n_frames})) AS f),
    ch AS (SELECT unnest(range({n_chunks})) AS k),
    byt AS (SELECT unnest(range(16)) AS j),
    b AS (
      SELECT d.doc_id, f.f, (ch.k * 16 + byt.j) AS idx,
             CAST(('0x' || substring(
               md5(CAST(d.doc_id AS VARCHAR) || ':v'
                   || CAST({gen} AS VARCHAR)
                   || ':' || CAST(ch.k AS VARCHAR)),
               byt.j * 2 + 1, 2)) AS BIGINT) AS v
      FROM documents d, f, ch, byt
      WHERE ch.k * 16 + byt.j < {n_bytes}
    ),
    px AS (
      SELECT doc_id, f, idx // 3 AS p,
             SUM(CASE idx % 3 WHEN 0 THEN v * 299
                             WHEN 1 THEN v * 587
                             ELSE v * 114 END) AS num
      FROM b GROUP BY doc_id, f, idx // 3
    ),
    lum AS (SELECT doc_id, f, p, num // 1000 AS g FROM px),
    mean AS (
      SELECT doc_id, f, SUM(g) // {n_px} AS m FROM lum GROUP BY doc_id, f
    ),
    lanes(l, wt) AS (VALUES {lanes}),
    hashes AS (
      SELECT lum.doc_id, lum.f,
             CAST(SUM(CASE WHEN g > m THEN wt ELSE 0 END) AS BIGINT) AS ahash
      FROM lum JOIN mean USING (doc_id, f) JOIN lanes ON lanes.l = lum.p
      GROUP BY lum.doc_id, lum.f
    )
    SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx, ahash,
           CAST(bit_count(xor(ahash, LAG(ahash) OVER w)) AS INT)
             AS hamming_prev,
           (f = 0 OR bit_count(xor(ahash, LAG(ahash) OVER w))
              > {hamming_threshold}) AS is_boundary
    FROM hashes
    WINDOW w AS (PARTITION BY doc_id ORDER BY f)
    """


def rle_shots_oracle(
    *, n_frames: int = 8, side: int = 8, hamming_threshold: int = 16
) -> str:
    """Replay of operators.multimodal.video_shot_boundaries over
    synth_rle_video — the INTER-FRAME codec leg: planes are 1-byte
    grayscale palette indices under an identity palette, so luminance
    equals the md5 byte exactly (299+587+114 = 1000 collapses), and
    the codec is lossless, so the oracle regenerates the planes with
    the closed-form scene rule (salt ':rl') and never models the RLE:
    any fault in run decode, DELTA cursor moves, canvas carry-over
    between frames, or the bottom-up flip changes a byte and flips the
    hash."""
    n_px = side * side
    n_chunks = (n_px + 15) // 16
    lanes = ", ".join(
        f"({l}, " + (str(1 << l) if l < 63 else "(-9223372036854775807 - 1)") + ")"
        for l in range(n_px)
    )
    scene = "CASE WHEN f.f >= 6 THEN 6 WHEN f.f >= 3 THEN 3 ELSE 0 END"
    gen = (
        f"CASE WHEN ch.k > ({scene}) AND ch.k <= f.f THEN ch.k "
        f"ELSE ({scene}) END"
    )
    return f"""
    WITH f AS (SELECT unnest(range({n_frames})) AS f),
    ch AS (SELECT unnest(range({n_chunks})) AS k),
    byt AS (SELECT unnest(range(16)) AS j),
    lum AS (
      SELECT d.doc_id, f.f, (ch.k * 16 + byt.j) AS p,
             CAST(('0x' || substring(
               md5(CAST(d.doc_id AS VARCHAR) || ':rl'
                   || CAST({gen} AS VARCHAR)
                   || ':' || CAST(ch.k AS VARCHAR)),
               byt.j * 2 + 1, 2)) AS BIGINT) AS g
      FROM documents d, f, ch, byt
      WHERE ch.k * 16 + byt.j < {n_px}
    ),
    mean AS (
      SELECT doc_id, f, SUM(g) // {n_px} AS m FROM lum GROUP BY doc_id, f
    ),
    lanes(l, wt) AS (VALUES {lanes}),
    hashes AS (
      SELECT lum.doc_id, lum.f,
             CAST(SUM(CASE WHEN g > m THEN wt ELSE 0 END) AS BIGINT) AS ahash
      FROM lum JOIN mean USING (doc_id, f) JOIN lanes ON lanes.l = lum.p
      GROUP BY lum.doc_id, lum.f
    )
    SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx, ahash,
           CAST(bit_count(xor(ahash, LAG(ahash) OVER w)) AS INT)
             AS hamming_prev,
           (f = 0 OR bit_count(xor(ahash, LAG(ahash) OVER w))
              > {hamming_threshold}) AS is_boundary
    FROM hashes
    WINDOW w AS (PARTITION BY doc_id ORDER BY f)
    """


def mjpeg_shots_oracle(
    *, n_frames: int = 8, side: int = 16, hamming_threshold: int = 16,
    q_dc: int = 3,
) -> str:
    """Replay of operators.multimodal.video_shot_boundaries over
    synth_mjpeg_video — an EXACT oracle through a LOSSY codec: block k
    of frame f is flat at ``v`` (first md5 byte of ``{id}:mj{g}:{k}``,
    scene-generation rule as video_shots_oracle), and a flat 8×8
    baseline-JPEG block decodes to exactly
    ``clip(round(q·round(8(v-128)/q)/8 + 128))`` with q = ``q_dc``
    (the DC luma quantizer at quality 90; never at a ROUND
    half-boundary — the multimodal_jpeg_blocks analysis: round(8c/3)
    has denominator 3, and 3j/8+128 needs j ≡ 4 (mod 8), unreachable
    since j mod 8 ∈ {0, 3, 5}). The engine integer-pools the 16×16
    frame to 8×8 (exact on flat blocks), so lane l of the aHash reads
    block ``2·(l//32) + (l%8)//4``; mean and bit packing replay
    _ahash64 verbatim, then the consecutive-frame hamming window."""
    grid = side // 8
    n_blocks = grid * grid
    lanes = ", ".join(
        f"({l}, "
        + (str(1 << l) if l < 63 else "(-9223372036854775807 - 1)")
        + f", {grid * ((l // 8) // (8 // grid)) + (l % 8) // (8 // grid)})"
        for l in range(64)
    )
    scene = "CASE WHEN f.f >= 6 THEN 6 WHEN f.f >= 3 THEN 3 ELSE 0 END"
    gen = (
        f"CASE WHEN blk.k > ({scene}) AND blk.k <= f.f THEN blk.k "
        f"ELSE ({scene}) END"
    )
    return f"""
    WITH f AS (SELECT unnest(range({n_frames})) AS f),
    blk AS (SELECT unnest(range({n_blocks})) AS k),
    vals AS (
      SELECT d.doc_id, f.f, blk.k,
             CAST(('0x' || substring(
               md5(CAST(d.doc_id AS VARCHAR) || ':mj'
                   || CAST({gen} AS VARCHAR)
                   || ':' || CAST(blk.k AS VARCHAR)),
               1, 2)) AS BIGINT) AS v
      FROM documents d, f, blk
    ),
    dec AS (
      SELECT doc_id, f, k,
             CAST(LEAST(255, GREATEST(0,
               ROUND({q_dc} * ROUND(8.0 * (v - 128) / {q_dc}) / 8.0 + 128)))
               AS BIGINT) AS g
      FROM vals
    ),
    mean AS (
      SELECT doc_id, f, (16 * SUM(g)) // 64 AS m
      FROM dec GROUP BY doc_id, f
    ),
    lanes(l, wt, b) AS (VALUES {lanes}),
    hashes AS (
      SELECT dec.doc_id, dec.f,
             CAST(SUM(CASE WHEN g > m THEN wt ELSE 0 END) AS BIGINT) AS ahash
      FROM dec JOIN mean USING (doc_id, f) JOIN lanes ON lanes.b = dec.k
      GROUP BY dec.doc_id, dec.f
    )
    SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx, ahash,
           CAST(bit_count(xor(ahash, LAG(ahash) OVER w)) AS INT)
             AS hamming_prev,
           (f = 0 OR bit_count(xor(ahash, LAG(ahash) OVER w))
              > {hamming_threshold}) AS is_boundary
    FROM hashes
    WINDOW w AS (PARTITION BY doc_id ORDER BY f)
    """


def kmeans_oracle(
    *,
    k: int = 8,
    rounds: int = 3,
    base_sql: str = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
) -> str:
    """Exact replay of operators.similarity.kmeans_assignments: the
    shifted int8 quantization (``floor(v_i/scale + 0.5) + 127``;
    ``scale = 0`` → the shifted origin), the (md5, vec_id)-ranked
    seed selection, then ``rounds`` Lloyd iterations unrolled as
    MATERIALIZED CTEs (DuckDB inlines non-recursive CTEs per
    reference — the chain is multiplicative without it). Assignment
    ties break ``ORDER BY dist, cid`` ≡ numpy argmin's first
    occurrence; centroid updates use ``//`` on non-negative operands
    ≡ Spark's ``div``; empty clusters COALESCE to the previous
    centroid. ``base_sql`` parameterizes the input relation (default:
    the embeddings table) so composed oracles — e.g. semdedup's
    planted-duplicate union — replay the same clustering over their
    own base."""
    ctes = [
        f"""base AS MATERIALIZED (
  {base_sql})""",
        """qv AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN [CAST(127 AS BIGINT) FOR x IN v]
              ELSE [CAST(floor(v[i] / scale + 0.5) AS BIGINT) + 127
                    FOR i IN generate_series(1, len(v))] END AS q
  FROM (SELECT vec_id, v,
               list_max([abs(x) FOR x IN v]) / 127.0 AS scale
        FROM base))""",
        f"""c0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS INTEGER) AS cid,
         q AS cent
  FROM (SELECT vec_id, q, md5(CAST(vec_id AS VARCHAR)) AS h FROM qv
        ORDER BY h, vec_id LIMIT {k}))""",
    ]
    for r in range(rounds + 1):
        ctes.append(
            f"""a{r} AS MATERIALIZED (
  SELECT vec_id, q, cid, dist FROM (
    SELECT vec_id, q, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT qv.vec_id, qv.q, c{r}.cid,
                 list_sum([(qv.q[i] - c{r}.cent[i]) * (qv.q[i] - c{r}.cent[i])
                           FOR i IN generate_series(1, len(qv.q))]) AS dist
          FROM qv CROSS JOIN c{r}))
  WHERE rn = 1)"""
        )
        if r < rounds:
            ctes.append(
                f"""c{r + 1} AS MATERIALIZED (
  SELECT c{r}.cid, COALESCE(u.cent, c{r}.cent) AS cent
  FROM c{r} LEFT JOIN (
    SELECT cid, list(val ORDER BY pos) AS cent FROM (
      SELECT cid, pos, SUM(v) // COUNT(*) AS val FROM (
        SELECT cid, unnest(generate_series(1, len(q))) AS pos,
               unnest(q) AS v
        FROM a{r})
      GROUP BY cid, pos)
    GROUP BY cid) u ON u.cid = c{r}.cid)"""
            )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vec_id, CAST(cid AS INT) AS centroid_id,
       CAST(dist AS BIGINT) AS dist
FROM a{rounds}"""
    )


def top_pc_oracle(*, iters: int = 8, norm_scale: int = 10**6) -> str:
    """Exact replay of operators.similarity.top_principal_component:
    the SIGNED int8 quantization (floor(v/scale + 0.5); scale = 0 → 0),
    the int64 uncentered Gram matrix, then ``iters`` power-iteration
    rounds unrolled as MATERIALIZED CTEs in HUGEINT with TRUNCATING
    division (DuckDB ``//`` truncates — the driver mirrors it via
    _tdiv), finishing with the integer Rayleigh quotient."""
    ctes = [
        """base AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
        """qv AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN [CAST(0 AS BIGINT) FOR x IN v]
              ELSE [CAST(floor(v[i] / scale + 0.5) AS BIGINT)
                    FOR i IN generate_series(1, len(v))] END AS q
  FROM (SELECT vec_id, v,
               list_max([abs(x) FOR x IN v]) / 127.0 AS scale
        FROM base))""",
        """x AS MATERIALIZED (
  SELECT vec_id, unnest(generate_series(1, len(q))) - 1 AS j,
         unnest(q) AS val
  FROM qv)""",
        """g AS MATERIALIZED (
  SELECT a.j, b.j AS k, CAST(SUM(a.val * b.val) AS BIGINT) AS gv
  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2)""",
        f"""v0 AS MATERIALIZED (
  SELECT DISTINCT j, CAST({norm_scale} AS HUGEINT) AS c FROM x)""",
    ]
    for r in range(iters):
        ctes.append(
            f"""w{r} AS MATERIALIZED (
  SELECT g.j, SUM(CAST(g.gv AS HUGEINT) * vr.c) AS w
  FROM g JOIN v{r} vr ON vr.j = g.k GROUP BY g.j)"""
        )
        ctes.append(
            f"""v{r + 1} AS MATERIALIZED (
  SELECT vr.j,
         CASE WHEN s.s IS NULL OR s.s = 0 THEN vr.c
              ELSE COALESCE(w.w, 0) * {norm_scale} // s.s END AS c
  FROM v{r} vr
  LEFT JOIN w{r} w ON w.j = vr.j
  CROSS JOIN (SELECT MAX(abs(w)) AS s FROM w{r}) s)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
num AS MATERIALIZED (
  SELECT COALESCE(SUM(CAST(g.gv AS HUGEINT) * va.c * vb.c), 0) AS n
  FROM g JOIN v{iters} va ON va.j = g.j JOIN v{iters} vb ON vb.j = g.k),
den AS MATERIALIZED (SELECT COALESCE(SUM(c * c), 0) AS d FROM v{iters})
SELECT CAST(v.j AS INT) AS dim_idx,
       CAST(v.c AS BIGINT) AS component,
       CAST(CASE WHEN den.d = 0 THEN 0 ELSE num.n // den.d END AS BIGINT)
         AS eigen_est
FROM v{iters} v, num, den"""
    )


def kmeans_diversity_oracle(*, k: int = 8, rounds: int = 3, cap: int = 25) -> str:
    """Cluster-capped diversity sample over the k-means assignments:
    per semantic cluster, keep the first ``cap`` members by the
    deterministic (md5, vec_id) permutation — the SemDeDup-flavored
    curation step that stops any one mode of the corpus from
    dominating the training mix."""
    kmeans = kmeans_oracle(k=k, rounds=rounds)
    head, _, _ = kmeans.rpartition("\nSELECT")
    return (
        head
        + f"""
SELECT vec_id, centroid_id, rank FROM (
  SELECT vec_id, CAST(cid AS INT) AS centroid_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY cid
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) AS rank
  FROM a{rounds})
WHERE rank <= {cap}"""
    )


def _perceptron_ctes(*, dim: int, rounds: int, min_words: int) -> list[str]:
    ctes = [
        r"""toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE trim(text) <> '')""",
        f"""feats AS MATERIALIZED (
  SELECT doc_id,
         CAST((CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT)) % {dim}
              AS INT) AS dim_idx,
         CAST(SUM(1 - 2 * (CAST(('0x' || substring(md5(token), 9, 2)) AS BIGINT)
                           % 2)) AS BIGINT) AS value
  FROM toks GROUP BY doc_id, dim_idx)""",
        rf"""lab AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= {min_words}
              THEN 1 ELSE -1 END AS y
  FROM documents WHERE trim(text) <> '')""",
        """x AS MATERIALIZED (
  SELECT f.doc_id, f.dim_idx, f.value, l.y
  FROM feats f JOIN lab l USING (doc_id))""",
        f"""w0 AS MATERIALIZED (
  SELECT unnest(generate_series(0, {dim - 1})) AS dim_idx,
         CAST(0 AS BIGINT) AS w)""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""m{r} AS MATERIALIZED (
  SELECT doc_id, y FROM (
    SELECT x.doc_id, SUM(x.value * w{r}.w) AS margin, MIN(x.y) AS y
    FROM x JOIN w{r} ON x.dim_idx = w{r}.dim_idx
    GROUP BY x.doc_id)
  WHERE y * margin <= 0)"""
        )
        ctes.append(
            f"""w{r + 1} AS MATERIALIZED (
  SELECT w{r}.dim_idx, w{r}.w + COALESCE(g.g, 0) AS w
  FROM w{r} LEFT JOIN (
    SELECT x.dim_idx, SUM(m{r}.y * x.value) AS g
    FROM x JOIN m{r} USING (doc_id) GROUP BY x.dim_idx) g
  ON g.dim_idx = w{r}.dim_idx)"""
        )
    return ctes


def perceptron_weights_oracle(
    *, dim: int = 64, rounds: int = 4, min_words: int = 20
) -> str:
    """Exact replay of operators.text.perceptron_train: the md5
    hashing-trick features, the word-count weak labels, and ``rounds``
    full-batch perceptron updates unrolled as MATERIALIZED CTEs
    (multiplicative re-execution without the hint). The batch gradient
    is a SUM over misclassified docs — order-independent int64, so
    the training loop is hash-exact across engines."""
    ctes = _perceptron_ctes(dim=dim, rounds=rounds, min_words=min_words)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(dim_idx AS INT) AS dim_idx, CAST(w AS BIGINT) AS weight
FROM w{rounds}"""
    )


def perceptron_predictions_oracle(
    *, dim: int = 64, rounds: int = 4, min_words: int = 20
) -> str:
    """Final-weights scoring pass over every featured doc: margin,
    ±1 prediction (margin 0 → −1), weak label, agreement."""
    ctes = _perceptron_ctes(dim=dim, rounds=rounds, min_words=min_words)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT doc_id, CAST(margin AS BIGINT) AS margin, CAST(y AS INT) AS label,
       CAST(CASE WHEN margin > 0 THEN 1 ELSE -1 END AS INT) AS pred,
       (CASE WHEN margin > 0 THEN 1 ELSE -1 END) = y AS correct
FROM (
  SELECT x.doc_id, SUM(x.value * wf.w) AS margin, MIN(x.y) AS y
  FROM x JOIN w{rounds} wf ON x.dim_idx = wf.dim_idx
  GROUP BY x.doc_id)"""
    )


def regression_suffstats_oracle(*, dim: int = 64) -> str:
    """Replay of operators.text.regression_suffstats: md5
    hashing-trick features, y = whitespace token count, upper-triangle
    Gram + moment vector as exact int64 sums."""
    return rf"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents WHERE trim(text) <> ''),
    feats AS MATERIALIZED (
      SELECT doc_id,
             CAST((CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT)) % {dim}
                  AS INT) AS dim_idx,
             CAST(SUM(1 - 2 * (CAST(('0x' || substring(md5(token), 9, 2))
                                    AS BIGINT) % 2)) AS BIGINT) AS value
      FROM toks GROUP BY doc_id, dim_idx),
    x AS MATERIALIZED (
      SELECT f.doc_id, f.dim_idx, f.value, y.y
      FROM feats f JOIN (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
        FROM documents WHERE trim(text) <> '') y USING (doc_id))
    SELECT a.dim_idx AS j, b.dim_idx AS k,
           CAST(SUM(a.value * b.value) AS BIGINT) AS value,
           'gram' AS kind
    FROM x a JOIN x b ON a.doc_id = b.doc_id AND a.dim_idx <= b.dim_idx
    GROUP BY a.dim_idx, b.dim_idx
    UNION ALL
    SELECT dim_idx AS j, CAST(-1 AS INT) AS k,
           CAST(SUM(value * y) AS BIGINT) AS value, 'xty' AS kind
    FROM x GROUP BY dim_idx"""


def token_chi2_oracle(*, label_sql: str = "lang = 'en'", min_df: int = 5) -> str:
    """Replay of operators.text.token_chi2: presence-based per-token
    contingency vs the boolean label, exact int64 determinant, then
    one fixed left-to-right IEEE double chain (identical in Spark),
    ROUND 4."""
    return rf"""
    WITH lab AS MATERIALIZED (
      SELECT doc_id, CAST(CASE WHEN {label_sql} THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM documents),
    tot AS MATERIALIZED (
      SELECT CAST(SUM(y) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0
      FROM lab),
    pres AS MATERIALIZED (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        FROM documents WHERE trim(text) <> '')),
    cnt AS MATERIALIZED (
      SELECT token, CAST(SUM(y) AS BIGINT) AS a,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS b
      FROM pres JOIN lab USING (doc_id) GROUP BY token)
    SELECT token, a, b,
           ROUND(CAST(n1 + n0 AS DOUBLE)
                 * CAST(a * (n0 - b) - b * (n1 - a) AS DOUBLE)
                 * CAST(a * (n0 - b) - b * (n1 - a) AS DOUBLE)
                 / (CAST(a + b AS DOUBLE)
                    * CAST((n1 - a) + (n0 - b) AS DOUBLE)
                    * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 4) AS chi2
    FROM cnt, tot
    WHERE a + b >= {min_df} AND a + b < n1 + n0
      AND n1 > 0 AND n0 > 0"""


def semantic_leakage_oracle(
    *,
    threshold: float = 0.45,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    val_pct: int = 10,
) -> str:
    """Cross-split semantic leakage: the seeded-LSH near-pair replay
    (:func:`near_pairs_lsh_oracle`) joined against the md5
    stable-bucket split replay, keeping only pairs that straddle the
    train/val boundary, oriented train-side first."""
    pairs = near_pairs_lsh_oracle(
        threshold=threshold, dim=dim, n_planes=n_planes, n_tables=n_tables
    )
    split = f"""
      SELECT doc_id,
             CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) % 100 < {100 - val_pct}
                  THEN 'train' ELSE 'val' END AS split
      FROM documents"""
    return f"""
    WITH p AS MATERIALIZED ({pairs}),
    s AS MATERIALIZED ({split})
    SELECT CASE WHEN sa.split = 'train' THEN p.id_a ELSE p.id_b END AS train_id,
           CASE WHEN sa.split = 'train' THEN p.id_b ELSE p.id_a END AS val_id,
           p.sim
    FROM p
    JOIN s sa ON sa.doc_id = p.id_a
    JOIN s sb ON sb.doc_id = p.id_b
    WHERE sa.split <> sb.split"""


def knn_graph_oracle(
    *,
    k: int = 3,
    threshold: float = 0.3,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> str:
    """Approximate kNN-graph replay: the seeded-LSH near pairs,
    symmetrized, then per-source top-k by (sim DESC, dst)."""
    pairs = near_pairs_lsh_oracle(
        threshold=threshold, dim=dim, n_planes=n_planes, n_tables=n_tables
    )
    return f"""
    WITH p AS MATERIALIZED ({pairs}),
    sym AS (
      SELECT id_a AS src, id_b AS dst, sim FROM p
      UNION ALL
      SELECT id_b AS src, id_a AS dst, sim FROM p)
    SELECT src, dst, sim, rank FROM (
      SELECT src, dst, sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY src ORDER BY sim DESC, dst) AS INT) AS rank
      FROM sym)
    WHERE rank <= {k}"""


def image_neardup_oracle(*, side: int = 8, max_hamming: int = 6) -> str:
    """Near-dup image pairs: the aHash replay
    (:func:`image_ahash_oracle`) joined all-pairs on hamming ≤
    ``max_hamming`` — exact recall ≡ the 8-chunk pigeonhole blocking
    for thresholds ≤ 7, so the banded Spark plan and this replay
    agree by construction. Every 25th image is planted again under a
    shifted id (same planted-evidence pattern as the PII audit): the
    synthetic pixel planes are md5-random, so without the plant the
    detector would be verified only on an empty result."""
    ahash = image_ahash_oracle(side=side)
    return f"""
    WITH h0 AS MATERIALIZED ({ahash}),
    h AS (
      SELECT media_id, ahash FROM h0
      UNION ALL
      SELECT media_id + 10000000 AS media_id, ahash
      FROM h0 WHERE media_id % 25 = 0)
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
    FROM h a JOIN h b ON a.media_id < b.media_id
    WHERE a.ahash IS NOT NULL AND b.ahash IS NOT NULL
      AND bit_count(xor(a.ahash, b.ahash)) <= {max_hamming}"""


def kmeans_profile_oracle(*, k: int = 8, rounds: int = 3) -> str:
    """Cluster-profile rollup over the k-means replay: size, total and
    mean inertia per cluster (floor-division mean keeps it exact) —
    the elbow/balance diagnostic read before trusting a clustering."""
    kmeans = kmeans_oracle(k=k, rounds=rounds)
    head, _, _ = kmeans.rpartition("\nSELECT")
    return (
        head
        + f"""
SELECT CAST(cid AS INT) AS centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist) AS BIGINT) AS inertia,
       CAST(SUM(dist) // COUNT(*) AS BIGINT) AS mean_dist
FROM a{rounds} GROUP BY cid"""
    )


def binary_quantize_oracle(*, dim: int = 64) -> str:
    """Sign-bit packing replay for ``similarity.binary_quantize``:
    word w = Σ_j 2^j over elements with v[64w+j] >= 0, as explicit
    HUGEINT power-of-two literals (never ``**``, whose DOUBLE result
    rounds above 2^53), folded to a signed BIGINT by the same
    two's-complement lane trick as the aHash oracle."""
    n_words = (dim + 63) // 64
    cols = []
    for w in range(n_words):
        terms = []
        for j in range(min(64, dim - 64 * w)):
            p = 1 << j
            lit = f"CAST('{p}' AS HUGEINT)" if p >= 1 << 63 else str(p)
            terms.append(
                f"(CASE WHEN embedding[{64 * w + j + 1}] >= 0 THEN {lit} ELSE 0 END)"
            )
        s = " + ".join(terms)
        cols.append(
            f"CAST(CASE WHEN ({s}) >= CAST('9223372036854775808' AS HUGEINT) "
            f"THEN ({s}) - CAST('18446744073709551616' AS HUGEINT) "
            f"ELSE ({s}) END AS BIGINT) AS word{w}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


def kmv_overlap_oracle(*, k: int = 16, n_cycle: int = 20) -> str:
    """KMV cross-source overlap replay for ``dedup.kmv_source_overlap``
    over the planted-overlap corpus (every 3rd document re-attributed
    to the cyclically-next source — md5-distinct synthetic texts have
    NO organic cross-source overlap, so without the plant every
    estimate would be a vacuous 0.0). The md5 hex string is the
    priority; the 48-bit prefix is rebuilt nibble-by-nibble for the
    (k-1)/u_k union estimator, and every double expression mirrors the
    Spark tree operation-for-operation."""
    p48 = " + ".join(
        f"{_NIBBLE.format(h='h', p=i + 1)} * {16 ** (11 - i)}" for i in range(12)
    )
    return f"""
    WITH d AS (
      SELECT source, text FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT 'src' || CAST((CAST(SUBSTR(source, 4) AS INT) + 1) % {n_cycle} AS VARCHAR) AS source,
             text
      FROM documents WHERE text IS NOT NULL AND doc_id % 3 = 0
    ),
    m AS (SELECT DISTINCT source, md5(text) AS h FROM d),
    sk AS (SELECT source, h FROM (
             SELECT source, h,
                    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
             FROM m) WHERE rn <= {k}),
    srcs AS (SELECT DISTINCT source FROM sk),
    pairs AS (SELECT a.source AS source_a, b.source AS source_b
              FROM srcs a JOIN srcs b ON a.source < b.source),
    pm AS (
      SELECT p.source_a, p.source_b, s.h,
             MAX(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN sk s ON s.source IN (p.source_a, p.source_b)
      GROUP BY 1, 2, 3),
    r AS (SELECT source_a, source_b, h, in_a, in_b,
                 ROW_NUMBER() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rn,
                 ({p48}) AS p48
          FROM pm),
    agg AS (
      SELECT source_a, source_b,
             COUNT(*) AS n_all,
             CAST(SUM(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) AS BIGINT) AS k_used,
             CAST(SUM(CASE WHEN rn <= {k} THEN in_a * in_b ELSE 0 END) AS BIGINT) AS n_common,
             MAX(CASE WHEN rn <= {k} THEN p48 END) AS p48_k
      FROM r GROUP BY 1, 2),
    est AS (
      SELECT source_a, source_b, k_used, n_common,
             CASE WHEN n_all >= {k}
                  THEN (CAST({k} AS DOUBLE) - 1.0)
                       / (CAST(p48_k AS DOUBLE) / 281474976710656.0)
                  ELSE CAST(k_used AS DOUBLE) END AS union_est,
             CAST(n_common AS DOUBLE) / CAST(k_used AS DOUBLE) AS jaccard_est
      FROM agg)
    SELECT source_a, source_b, k_used, n_common, union_est, jaccard_est,
           jaccard_est * union_est AS inter_est
    FROM est"""


def kmv_cardinality_oracle(*, k: int = 16) -> str:
    """Per-source KMV distinct-estimate replay for
    ``dedup.kmv_cardinality``: bottom-k by md5-hex order, 48-bit
    prefix rebuilt nibble-by-nibble, the same fixed-order double
    expression for (k-1)/u_k. k=16 < the 25 distinct docs per
    synthetic source, so the saturated estimator branch is organically
    live; the unsaturated (exact) branch is pinned by unit and
    streaming tests. Saturation needs an observed (k+1)-th distinct
    value (rank k+1 row), mirroring the operator: a complete sketch of
    exactly k members reports the exact count."""
    p48 = " + ".join(
        f"{_NIBBLE.format(h='h', p=i + 1)} * {16 ** (11 - i)}" for i in range(12)
    )
    return f"""
    WITH m AS (SELECT DISTINCT source, md5(text) AS h
               FROM documents WHERE text IS NOT NULL),
    sk AS (SELECT source, h, rn FROM (
             SELECT source, h,
                    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
             FROM m) WHERE rn <= {k} + 1),
    agg AS (SELECT source,
                   CAST(SUM(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_sketch,
                   MAX(CASE WHEN rn <= {k} THEN {p48} END) AS p48_k,
                   MAX(rn) > {k} AS saturated
            FROM sk GROUP BY source)
    SELECT source, n_sketch,
           CASE WHEN saturated
                THEN (CAST({k} AS DOUBLE) - 1.0)
                     / (CAST(p48_k AS DOUBLE) / 281474976710656.0)
                ELSE CAST(n_sketch AS DOUBLE) END AS distinct_est,
           saturated
    FROM agg"""


def hits_oracle(
    *,
    iterations: int = 4,
    scale: int = 10**6,
    threshold: float = 0.6,
    plant_mod: int = 101,
) -> str:
    """Unrolled fixed-point HITS replay for ``dedup.hits`` over the
    directed containment graph, with planted AGGREGATOR documents
    (every ``plant_mod``-th doc id also appears concatenated with its
    two successors under a shifted id) — organic near-dup pairs are
    mostly mutual, so without the plant the hub/authority separation
    HITS exists to measure would be vacuous. Max-normalized bigint
    rounds replayed as MATERIALIZED CTEs; the scalar MAX subqueries
    read materialized results, so no exponential CTE re-execution."""
    ctes = [
        r"""d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    planted AS (
      SELECT a.doc_id + 20000000 AS doc_id,
             a.text || ' ' || b.text || ' ' || c.text AS text
      FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
               JOIN d c ON c.doc_id = a.doc_id + 2
      WHERE a.doc_id %% %(mod)d = 0),
    corpus AS (SELECT * FROM d UNION ALL SELECT * FROM planted),
    sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in generate_series(1, len(w) - 2)]
               END
             ) AS shingles
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
            FROM corpus)
    ),
    pc AS MATERIALIZED (
      -- r14: shared-shingle candidate join replaces the quadratic
      -- all-pairs cross join (identical rows: shared > 0 IS the
      -- candidate condition)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(a.shingles) AS size_a, len(b.shingles) AS size_b,
             _cand._shared AS shared
      FROM (
        SELECT i1.doc_id AS _da, i2.doc_id AS _db,
               COUNT(*) AS _shared
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i1
        JOIN (SELECT doc_id, unnest(shingles) AS s FROM sh) i2
          ON i1.s = i2.s AND i1.doc_id < i2.doc_id
        GROUP BY 1, 2
      ) _cand
      JOIN sh a ON a.doc_id = _cand._da
      JOIN sh b ON b.doc_id = _cand._db),
    edges AS MATERIALIZED (
      SELECT doc_b AS u, doc_a AS v FROM pc
      WHERE ROUND(CAST(shared AS DOUBLE) / size_a, 4) >= %(thr)s
      UNION
      SELECT doc_a AS u, doc_b AS v FROM pc
      WHERE ROUND(CAST(shared AS DOUBLE) / size_b, 4) >= %(thr)s),
    nodes AS MATERIALIZED (SELECT u AS x FROM edges UNION SELECT v AS x FROM edges),
    s0 AS (SELECT x, CAST(%(scale)d AS BIGINT) AS h, CAST(0 AS BIGINT) AS a
           FROM nodes)"""
        % {"mod": plant_mod, "thr": threshold, "scale": scale}
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""ar{k} AS MATERIALIZED (
      SELECT n.x, COALESCE(s.ar, 0) AS ar FROM nodes n LEFT JOIN (
        SELECT e.v AS x, SUM(p.h) AS ar FROM edges e
        JOIN s{k - 1} p ON e.u = p.x GROUP BY e.v) s ON n.x = s.x),
    a{k} AS MATERIALIZED (
      SELECT x, CAST((ar * {scale}) // (SELECT MAX(ar) FROM ar{k}) AS BIGINT) AS a
      FROM ar{k}),
    hr{k} AS MATERIALIZED (
      SELECT n.x, COALESCE(s.hr, 0) AS hr FROM nodes n LEFT JOIN (
        SELECT e.u AS x, SUM(p.a) AS hr FROM edges e
        JOIN a{k} p ON e.v = p.x GROUP BY e.u) s ON n.x = s.x),
    s{k} AS MATERIALIZED (
      SELECT h.x, CAST((h.hr * {scale}) // (SELECT MAX(hr) FROM hr{k}) AS BIGINT) AS h,
             a.a
      FROM hr{k} h JOIN a{k} a ON h.x = a.x)"""
        )
    joined = ",\n    ".join(ctes)
    return (
        f"WITH {joined}\n"
        f"SELECT x AS doc_id, h AS hub_fp, a AS auth_fp FROM s{iterations}"
    )


def bitext_mutual_oracle(
    *,
    threshold: float = 0.3,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    parity_mod: int = 2,
) -> str:
    """Replay of similarity.bitext_mutual_top1 over the seeded-LSH
    candidate pairs: orient cross-parity pairs even-side first, mutual
    top-1 via two windows, margins from the rounded sims."""
    ctes = _lsh_pair_ctes(
        dim=dim, n_planes=n_planes, n_tables=n_tables, seed=42
    ).format(threshold=threshold)
    return f"""
    WITH {ctes},
    o AS (
      SELECT CASE WHEN id_a % {parity_mod} = 0 THEN id_a ELSE id_b END AS src,
             CASE WHEN id_a % {parity_mod} = 0 THEN id_b ELSE id_a END AS dst,
             sim
      FROM pairs WHERE (id_a % {parity_mod} = 0) <> (id_b % {parity_mod} = 0)
    ),
    r AS (
      SELECT src, dst, sim,
             ROW_NUMBER() OVER ws AS rs, LEAD(sim, 1) OVER ws AS second_s,
             ROW_NUMBER() OVER wd AS rd, LEAD(sim, 1) OVER wd AS second_d
      FROM o
      WINDOW ws AS (PARTITION BY src ORDER BY sim DESC, dst),
             wd AS (PARTITION BY dst ORDER BY sim DESC, src)
    )
    SELECT src, dst, sim,
           ROUND(sim - COALESCE(second_s, 0.0), 5) AS margin_src,
           ROUND(sim - COALESCE(second_d, 0.0), 5) AS margin_dst
    FROM r WHERE rs = 1 AND rd = 1
    """


def mmr_oracle(
    *,
    k: int = 10,
    pool: int = 50,
    lam_tenths: int = 7,
) -> str:
    """Unrolled greedy replay of ``similarity.mmr_diversified_topk``:
    the pool cut and the integer micro-sim arithmetic are shared
    expressions; each selection round is one MATERIALIZED CTE (the
    cumulative-union chain would otherwise re-execute earlier rounds
    exponentially — the bpe oracle pattern), picking the max of
    ``λ·sim_q − (1−λ)·max_selected_sim`` with the id tiebreak."""
    lam_c = 10 - lam_tenths
    micro = (
        "CAST(CAST(ROUND(list_cosine_similarity({a}, {b}), 6) "
        "AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    )
    sq = micro.format(a="CAST(embedding AS DOUBLE[])", b="(SELECT qv FROM q)")
    ctes = [
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)",
        f"""pool AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, {sq} AS sq
          FROM embeddings ORDER BY sq DESC, vec_id LIMIT {pool})""",
        f"""pw AS MATERIALIZED (
          SELECT a.vec_id AS va, b.vec_id AS vb, {micro.format(a='a.e', b='b.e')} AS s
          FROM pool a JOIN pool b ON a.vec_id <> b.vec_id)""",
        f"""sel1 AS MATERIALIZED (
          SELECT 1 AS rank, vec_id, sq, {lam_tenths} * sq AS score
          FROM pool ORDER BY score DESC, vec_id LIMIT 1)""",
        "acc1 AS (SELECT * FROM sel1)",
    ]
    for r in range(2, k + 1):
        ctes.append(
            f"""sel{r} AS MATERIALIZED (
          SELECT {r} AS rank, p.vec_id, p.sq,
                 {lam_tenths} * p.sq - {lam_c} * (
                   SELECT MAX(s) FROM pw
                   WHERE va = p.vec_id
                     AND vb IN (SELECT vec_id FROM acc{r - 1})) AS score
          FROM pool p
          WHERE p.vec_id NOT IN (SELECT vec_id FROM acc{r - 1})
          ORDER BY score DESC, p.vec_id LIMIT 1)"""
        )
        ctes.append(
            f"acc{r} AS (SELECT * FROM acc{r - 1} UNION ALL SELECT * FROM sel{r})"
        )
    joined = ",\n    ".join(ctes)
    return (
        f"WITH {joined}\n"
        f"SELECT CAST(rank AS INT) AS rank, vec_id, sq AS sim_q_micro,\n"
        f"       CAST(score AS BIGINT) AS mmr_score FROM acc{k}"
    )


def shared_runs_oracle(
    *,
    n: int = 3,
    min_run_tokens: int = 15,
    max_df: int = 100,
    plant_mod: int = 25,
    plant_tokens: int = 40,
) -> str:
    """Replay of ``dedup.shared_run_pairs`` over the planted-recrawl
    corpus: positional shingles (position order, duplicates kept),
    hash64 rebuilt from md5 hex so even collisions agree, df cap on
    rows-per-hash, diagonal consecutive-position islands via
    ``pos − ROW_NUMBER()``, per-pair max run."""
    return f"""
    WITH uni AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id,
             'ph' || CAST(doc_id AS VARCHAR) || ' ' ||
             array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:{plant_tokens}], ' ')
             || ' pt' || CAST(doc_id AS VARCHAR) AS text
      FROM documents
      WHERE text IS NOT NULL AND trim(text) <> '' AND doc_id % {plant_mod} = 0
    ),
    tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            FROM uni WHERE trim(text) <> ''),
    sh AS (SELECT doc_id,
                  CASE WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
                       ELSE [array_to_string(w[i : i + {n - 1}], ' ')
                             for i in generate_series(1, len(w) - {n - 1})] END AS gs
           FROM tok),
    ps AS (SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos,
                  unnest(gs) AS s
           FROM sh),
    hx AS (SELECT doc_id, pos, {hash64_sql('hh')} AS h
           FROM (SELECT doc_id, pos, md5(s) AS hh FROM ps)),
    cap AS (SELECT doc_id, pos, h FROM (
              SELECT doc_id, pos, h, COUNT(*) OVER (PARTITION BY h) AS dfh
              FROM hx)
            WHERE dfh <= {max_df}),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
                 a.pos - b.pos AS diag
          FROM cap a JOIN cap b ON a.h = b.h AND a.doc_id < b.doc_id),
    r AS (SELECT doc_a, doc_b, diag,
                 pos_a - ROW_NUMBER() OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
          FROM p),
    agg AS (SELECT doc_a, doc_b, CAST(COUNT(*) + {n - 1} AS BIGINT) AS run_tokens
            FROM r GROUP BY doc_a, doc_b, diag, grp)
    SELECT doc_a, doc_b, CAST(MAX(run_tokens) AS BIGINT) AS longest_run_tokens
    FROM agg GROUP BY doc_a, doc_b
    HAVING MAX(run_tokens) >= {min_run_tokens}
    """


def sentence_semdedup_base_sql(
    *, dim: int = 16, chunk: int = 8, plant_doc_mod: int = 20,
    plant_offset: int = 10**15,
) -> str:
    """(vec_id, v DOUBLE[]) base for the SENTENCE-level SemDeDup
    composition: '.'-split sentences (the udtf_sentence_split
    segmentation) sub-chunked into ``chunk``-token windows (the
    unpunctuated-text fallback — this corpus has no '.'), each unit
    embedded by the md5 hashing trick (same arithmetic as
    text_hashed_features) into a ``dim``-dim signed-count vector.
    Unit id = doc_id·10⁸ + sentence·10⁴ + chunk (strides widened per
    the r7 advice: room for 10⁴ sentences/doc and 8·10⁴ tokens/
    sentence before a collision, with the Spark side raising — not
    silently merging — past the bound). Plants: the
    first chunk of every ``plant_doc_mod``-th doc is mirrored at
    +``plant_offset`` — identical vector ⇒ live prune branch per the
    vacuous-check rule."""
    dims = ",\n           ".join(
        f"CAST(SUM(CASE WHEN dim_idx = {d} THEN value ELSE 0 END) AS DOUBLE)"
        for d in range(dim)
    )
    return rf"""WITH sent AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           unnest(string_split(text, '.')) AS piece,
           generate_subscripts(string_split(text, '.'), 1) AS ord
    FROM documents WHERE text IS NOT NULL
  ),
  spos AS (
    SELECT doc_id, piece,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS sidx
    FROM sent WHERE trim(piece) <> ''
  ),
  tok AS (
    SELECT doc_id, sidx,
           unnest(list_filter(regexp_split_to_array(trim(lower(piece)),
                                                    '\s+'), x -> x <> ''))
             AS token,
           generate_subscripts(
             list_filter(regexp_split_to_array(trim(lower(piece)), '\s+'),
                         x -> x <> ''), 1) AS tpos
    FROM spos
  ),
  hashed AS (
    SELECT doc_id * 100000000 + sidx * 10000 + (tpos - 1) // {chunk} AS uvid,
           CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT) % {dim}
             AS dim_idx,
           1 - 2 * (CAST(('0x' || substring(md5(token), 9, 2)) AS BIGINT) % 2)
             AS value
    FROM tok
  ),
  dense AS (
    SELECT uvid AS vec_id, [{dims}] AS v
    FROM hashed GROUP BY uvid
  )
  SELECT vec_id, v FROM dense
  UNION ALL
  SELECT vec_id + {plant_offset}, v FROM dense
  WHERE vec_id % 10000 = 0 AND (vec_id // 100000000) % {plant_doc_mod} = 0"""


def semdedup_oracle(
    *,
    k: int = 8,
    rounds: int = 3,
    threshold_num: int = 9,
    threshold_den: int = 20,
    planted_offset: int = 1_000_000,
    planted_mod: int = 100,
    base_sql: str | None = None,
) -> str:
    """Exact replay of operators.similarity.semdedup_prune over the
    planted-duplicate base (default: every vec_id % planted_mod == 0
    of the embeddings table is mirrored at vec_id + planted_offset —
    identical vector, so each plant is a guaranteed within-cluster
    near-dup of its original and the prune branch is provably
    non-vacuous): the kmeans CTE chain runs over the unioned base,
    then centered int8 dots within each cluster, the cross-multiplied
    integer cosine threshold, and the (dist, id)-dominance prune.
    ``base_sql`` overrides the input relation entirely (must yield
    (vec_id, v DOUBLE[]) and include its own plants) — the
    sentence-level composition uses this."""
    if base_sql is None:
        base_sql = f"""SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + {planted_offset}, CAST(embedding AS DOUBLE[])
  FROM embeddings WHERE vec_id % {planted_mod} = 0"""
    kmeans = kmeans_oracle(k=k, rounds=rounds, base_sql=base_sql)
    head, _, _ = kmeans.rpartition("\nSELECT")
    t2 = threshold_num * threshold_num
    d2 = threshold_den * threshold_den
    return (
        head
        + f""",
memb AS MATERIALIZED (
  SELECT vec_id, CAST(cid AS INT) AS centroid_id,
         CAST(dist AS BIGINT) AS dist, q
  FROM a{rounds}),
x AS MATERIALIZED (
  SELECT vec_id, centroid_id,
         unnest(generate_series(1, len(q))) AS pos,
         unnest(q) - 127 AS sval
  FROM memb),
nrm AS MATERIALIZED (
  SELECT vec_id, CAST(SUM(sval * sval) AS BIGINT) AS nrm
  FROM x GROUP BY vec_id),
dots AS MATERIALIZED (
  SELECT xa.vec_id AS va, xb.vec_id AS vb,
         CAST(SUM(xa.sval * xb.sval) AS BIGINT) AS dot
  FROM x xa JOIN x xb
    ON xa.centroid_id = xb.centroid_id AND xa.pos = xb.pos
   AND xa.vec_id < xb.vec_id
  GROUP BY 1, 2),
simp AS MATERIALIZED (
  SELECT d.va, d.vb
  FROM dots d JOIN nrm a ON a.vec_id = d.va JOIN nrm b ON b.vec_id = d.vb
  WHERE d.dot > 0 AND {d2} * d.dot * d.dot >= {t2} * a.nrm * b.nrm),
pruned AS MATERIALIZED (
  SELECT DISTINCT CASE WHEN ma.dist < mb.dist
                    OR (ma.dist = mb.dist AND s.va < s.vb)
                  THEN s.vb ELSE s.va END AS vec_id
  FROM simp s
  JOIN memb ma ON ma.vec_id = s.va
  JOIN memb mb ON mb.vec_id = s.vb)
SELECT m.vec_id, m.centroid_id, m.dist,
       (p.vec_id IS NULL) AS kept
FROM memb m LEFT JOIN pruned p ON p.vec_id = m.vec_id"""
    )
