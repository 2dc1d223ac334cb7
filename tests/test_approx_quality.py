"""Deterministic quality gates for the approximate-by-design operators.

Round-4 shape: the five approximate registry queries now emit GATE
VERDICTS (exact payload + a deterministic within-tolerance boolean) so
the driver's hash check covers them; these tests pin the TIGHTER
per-sf recall/error bounds against the exact twins at the operator
level, plus assert the registry gate booleans are actually true."""

import pyspark.sql.functions as F

from hadoopxmlextractor_spark.operators import similarity as S
from hadoopxmlextractor_spark.pipeline_queries import (
    _query_vec,
    q_similarity_topk_bruteforce,
    q_similarity_topk_ivf,
    q_similarity_topk_ivfpq,
    q_similarity_topk_pq,
)
from hadoopxmlextractor_spark.queries import q_agg_approx_distinct
from hadoopxmlextractor_spark.queries_ext import q_percentiles_approx
from hadoopxmlextractor_spark.tables import load

SF = "/root/testdata/sf0.001"


def _exact_top20(spark):
    return [r["vec_id"] for r in q_similarity_topk_bruteforce(spark, SF).collect()]


def _check_ann(exact, got, min_recall):
    assert len(exact) == len(got) == 20
    overlap = len(set(exact) & set(got))
    assert overlap >= min_recall, f"recall {overlap}/20 vs exact top-20"
    # the self-match must rank first, and (exact re-rank) every common
    # hit must appear in the same relative order as the exact ranking
    assert got[0] == exact[0]
    exact_rank = {v: i for i, v in enumerate(exact)}
    common = [v for v in got if v in exact_rank]
    assert common == sorted(common, key=exact_rank.__getitem__)


def test_ivf_topk_recall_vs_exact(spark):
    # registry parameters (nprobe=12/16): recall ≥ 15/20 at sf0.001
    emb = load(spark, SF, "embeddings")
    qv = _query_vec(spark, SF)
    exact = _exact_top20(spark)
    ivf = [
        r["vec_id"]
        for r in S.ivf_topk(emb, qv, k=20, n_centroids=16, nprobe=12).collect()
    ]
    _check_ann(exact, ivf, 15)


def test_pq_topk_recall_vs_exact(spark):
    emb = load(spark, SF, "embeddings")
    qv = _query_vec(spark, SF)
    exact = _exact_top20(spark)
    pq = [
        r["vec_id"]
        for r in S.pq_topk(emb, qv, k=20, m=8, n_codes=16, refine=12).collect()
    ]
    _check_ann(exact, pq, 15)


def test_ivfpq_topk_recall_vs_exact(spark):
    emb = load(spark, SF, "embeddings")
    qv = _query_vec(spark, SF)
    exact = _exact_top20(spark)
    got = [
        r["vec_id"]
        for r in S.ivf_pq_topk(
            emb, qv, k=20, n_centroids=16, nprobe=12, m=8, n_codes=16, refine=12
        ).collect()
    ]
    _check_ann(exact, got, 14)


def test_gated_ann_queries_emit_exact_top20_and_true_flags(spark):
    # The registry queries' hashed payload = exact top-20 + verdict
    # flag; the flag must be TRUE (the oracle emits literal TRUE).
    exact = _exact_top20(spark)
    for fn, flag in (
        (q_similarity_topk_ivf, "ivf_recall_ge_50pct"),
        (q_similarity_topk_pq, "pq_recall_ge_50pct"),
        (q_similarity_topk_ivfpq, "ivfpq_recall_ge_50pct"),
    ):
        rows = fn(spark, SF).collect()
        assert [r["vec_id"] for r in rows] == exact
        assert all(r[flag] for r in rows), flag


def test_approx_distinct_close_to_exact(spark):
    # approx_count_distinct at rsd=0.01 is HLL++; per-group estimates
    # must land within 2% of the exact distinct counts (2x the
    # configured relative standard deviation). The registry query's
    # gate flag asserts exactly this, so check the flag AND re-derive
    # the bound independently.
    gated = q_agg_approx_distinct(spark, SF).collect()
    assert all(r["approx_within_2pct"] for r in gated)
    approx = {
        r["event_type"]: r["approx"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx"))
        .collect()
    }
    exact = {r["event_type"]: r["exact_users"] for r in gated}
    assert set(approx) == set(exact)
    for et, a in approx.items():
        assert abs(a - exact[et]) / exact[et] <= 0.02, (et, a, exact[et])


def test_percentiles_approx_close_to_exact(spark):
    # percentile_approx at accuracy 10000 guarantees rank error
    # <= n/10000; on this data that bounds the VALUE error well under
    # 1% of the exact percentile per group — which is the registry
    # query's gate flag. Check the flag and the exact payload.
    gated = {
        r["l_returnflag"]: r for r in q_percentiles_approx(spark, SF).collect()
    }
    assert all(r["approx_within_1pct"] for r in gated.values())
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in load(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        )
        .collect()
    }
    assert set(gated) == set(exact)
    for flag, (e50, e95) in exact.items():
        assert gated[flag]["p50_exact"] == e50
        assert gated[flag]["p95_exact"] == e95


def test_hll_sketch_union_matches_single_pass(spark):
    # Merge correctness: unioning per-day sketches must estimate the
    # same cardinality as one sketch built over the whole stream —
    # the property that makes pre-aggregated daily sketches a lossless
    # substitute for rescans (exactly, while sketches are in sparse
    # mode; within the usual HLL error once promoted).
    ev = load(spark, SF, "events")
    merged = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
        .groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias("est"))
        .collect()
    }
    single = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").cast("long").alias("est"))
        .collect()
    }
    assert merged == single


def test_quantile_sketch_merge_within_tolerance_of_exact(spark):
    # The bottom-k-by-md5 sample is a uniform 256-row sample of ~10k
    # events: its read-off quantiles must land within a few percentile
    # points of the exact ones (binomial bound: ~±3 points at k=256
    # with overwhelming probability for this fixed, deterministic
    # sample — the assertion is reproducible, not flaky).
    from hadoopxmlextractor_spark.events_queries import (
        q_agg_quantile_sketch_merge,
    )

    sf = "/root/testdata/sf0.01"
    row = q_agg_quantile_sketch_merge(spark, sf).collect()[0]
    ev = load(spark, sf, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    n = ev.count()
    for est, q in ((row["p50_cents"], 0.5), (row["p90_cents"], 0.9)):
        # the estimate's true rank among ALL events
        rank = ev.filter(F.col("cents") <= est).count() / n
        assert abs(rank - q) < 0.06, (q, est, rank)
    assert row["n_sample"] == 256


def test_top_pc_aligns_with_numpy_eigenvector(spark):
    # The integer power iteration must actually FIND the top principal
    # direction: against numpy's exact eigendecomposition of the same
    # quantized Gram matrix, the output direction's Rayleigh quotient
    # must capture >= 95% of the true top eigenvalue, and eigen_est
    # must agree with the quotient of the returned vector.
    import numpy as np

    from hadoopxmlextractor_spark.operators.similarity import (
        quantize_vec,
        top_principal_component,
    )

    emb = load(spark, SF, "embeddings")
    rows = top_principal_component(emb, iters=24).collect()
    v = np.zeros(len(rows))
    for r in rows:
        v[r["dim_idx"]] = r["component"]
    eig_est = rows[0]["eigen_est"]

    Q = np.stack(
        [quantize_vec(np.asarray(r["embedding"], dtype=np.float64))[1]
         for r in emb.collect()]
    ).astype(np.float64)
    G = Q.T @ Q
    true_top = np.linalg.eigvalsh(G)[-1]
    rq = float(v @ G @ v) / float(v @ v)
    assert rq >= 0.95 * true_top, (rq, true_top)
    assert abs(eig_est - rq) <= max(1.0, 0.01 * rq)
