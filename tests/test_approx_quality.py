"""Deterministic quality gates for the two approximate-by-design
queries (round-2 verdict item 7): rows-only driver checks are weak, so
pin recall / error bounds against the exact twins in pytest. Both run
on real testdata so the assertions track the shipped parameters."""

import pyspark.sql.functions as F

from hadoopxmlextractor_spark.pipeline_queries import (
    _query_vec,
    q_similarity_topk_bruteforce,
    q_similarity_topk_ivf,
)
from hadoopxmlextractor_spark.queries_ext import (
    q_percentiles_approx,
    q_percentiles_exact,
)
from hadoopxmlextractor_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_ivf_topk_recall_vs_exact(spark):
    # IVF with n_centroids=16, nprobe=4 probes a quarter of the space;
    # on the test corpus its top-20 must recover >= 15 of the exact
    # top-20 AND agree exactly on the head of the ranking (the query
    # vector itself plus its strongest neighbors live in the probed
    # cells by construction).
    exact = [r["vec_id"] for r in q_similarity_topk_bruteforce(spark, SF).collect()]
    ivf = [r["vec_id"] for r in q_similarity_topk_ivf(spark, SF).collect()]
    assert len(exact) == len(ivf) == 20
    overlap = len(set(exact) & set(ivf))
    assert overlap >= 15, f"IVF recall {overlap}/20 vs exact top-20"
    # rank agreement on the head: the self-match must rank first and
    # every IVF hit must appear in the same relative order as exact
    assert ivf[0] == exact[0]
    exact_rank = {v: i for i, v in enumerate(exact)}
    common = [v for v in ivf if v in exact_rank]
    assert common == sorted(common, key=exact_rank.__getitem__)


def test_approx_distinct_close_to_exact(spark):
    # approx_count_distinct at rsd=0.01 is HLL++; per-group estimates
    # must land within 2% of the exact distinct counts (2x the
    # configured relative standard deviation).
    from hadoopxmlextractor_spark.queries import q_agg_approx_distinct

    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_agg_approx_distinct(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        assert abs(a - exact[et]) / exact[et] <= 0.02, (et, a, exact[et])


def test_percentiles_approx_close_to_exact(spark):
    # percentile_approx at accuracy 10000 guarantees rank error
    # <= n/10000; on this data that bounds the VALUE error well under
    # 1% of the exact percentile per group.
    approx = {
        r["l_returnflag"]: (r["approx_p50"], r["approx_p95"])
        for r in q_percentiles_approx(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in load(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, (a50, a95) in approx.items():
        e50, e95 = exact[flag]
        assert abs(a50 - e50) / e50 < 0.01, (flag, a50, e50)
        assert abs(a95 - e95) / e95 < 0.01, (flag, a95, e95)


def test_pq_topk_recall_vs_exact(spark):
    # 8-byte PQ codes + ADC + exact re-rank of the top-80: must recover
    # >= 15 of the exact top-20, rank the self-match first, and (since
    # surviving candidates are re-scored with the EXACT cosine) order
    # every common hit identically to the exact ranking.
    from hadoopxmlextractor_spark.pipeline_queries import q_similarity_topk_pq

    exact = [r["vec_id"] for r in q_similarity_topk_bruteforce(spark, SF).collect()]
    pq = [r["vec_id"] for r in q_similarity_topk_pq(spark, SF).collect()]
    assert len(exact) == len(pq) == 20
    overlap = len(set(exact) & set(pq))
    assert overlap >= 15, f"PQ recall {overlap}/20 vs exact top-20"
    assert pq[0] == exact[0]
    exact_rank = {v: i for i, v in enumerate(exact)}
    common = [v for v in pq if v in exact_rank]
    assert common == sorted(common, key=exact_rank.__getitem__)


def test_ivfpq_topk_recall_vs_exact(spark):
    # The composed IVF-PQ path is bounded above by IVF's cell recall
    # (15/20 at nprobe=6 on this corpus); the PQ candidate stage +
    # exact re-rank must not cost more than one additional hit.
    from hadoopxmlextractor_spark.pipeline_queries import q_similarity_topk_ivfpq

    exact = [r["vec_id"] for r in q_similarity_topk_bruteforce(spark, SF).collect()]
    got = [r["vec_id"] for r in q_similarity_topk_ivfpq(spark, SF).collect()]
    assert len(exact) == len(got) == 20
    overlap = len(set(exact) & set(got))
    assert overlap >= 14, f"IVF-PQ recall {overlap}/20 vs exact top-20"
    assert got[0] == exact[0]
    exact_rank = {v: i for i, v in enumerate(exact)}
    common = [v for v in got if v in exact_rank]
    assert common == sorted(common, key=exact_rank.__getitem__)


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
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.events_queries import (
        q_agg_quantile_sketch_merge,
    )
    from hadoopxmlextractor_spark.tables import load

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
