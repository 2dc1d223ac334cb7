"""Declarative corpus-pipeline compiler — the relational counterpart
of the reference's config-driven job surface (reference semantics:
scripts/run.sh drives XmlExtractor.java entirely from a Hadoop XML
config; our config.py reproduces that for extraction). A pipeline
spec (dict or JSON) names stages and parameters; compilation builds
ONE lazy DataFrame plan, so Catalyst sees the whole job and the
config adds zero runtime overhead versus hand-written composition.

    {"source": "documents",
     "stages": [
       {"op": "quality_filter"},
       {"op": "dedup_exact"},
       {"op": "decontaminate", "params": {"bench_pct": 5, "min_shared": 10}},
       {"op": "pack_sequences", "params": {"capacity": 256, "n_shards": 32}}]}

Every stage maps (doc_id, text) -> (doc_id, text) except a terminal
stage (pack_sequences), which may change the schema. Unknown ops and
bad params fail at COMPILE time with the available vocabulary — the
config is validated before any job runs, like the reference's
rule-count check in config.py.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators import corpus as C
from hadoopxmlextractor_spark.operators import dedup as D
from hadoopxmlextractor_spark.operators import text as T
from hadoopxmlextractor_spark.tables import load


def _stage_quality_filter(df: DataFrame, docs: DataFrame, **params) -> DataFrame:
    return (
        C.quality_filter(df, "text", "doc_id", carry=("text",), **params)
        .filter("keep")
        .select("doc_id", "text")
    )


def _stage_dedup_exact(df: DataFrame, docs: DataFrame) -> DataFrame:
    return D.dedup_exact(df, "text", "doc_id").select("doc_id", "text")


def _stage_classifier_filter(df: DataFrame, docs: DataFrame, *, dim: int = 64) -> DataFrame:
    margins = T.classifier_margin(df, "text", "doc_id", dim=dim)
    return (
        df.join(margins.filter("keep").select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "text")
    )


def _stage_decontaminate(
    df: DataFrame, docs: DataFrame, *, bench_pct: int = 5, min_shared: int = 10
) -> DataFrame:
    # benchmark set = the top bench_pct stable buckets of the FULL
    # corpus (independent of upstream filtering, like a held-out eval
    # suite); contaminated train docs are anti-joined away and
    # benchmark-bucket docs themselves never ship as training data.
    # r14-opt: bucket split BEFORE the (nondeterministic-marked)
    # shingle UDF — guide §4.4; see corpus_prepare_training_data.
    base = docs.withColumn("bucket", C.stable_bucket("doc_id", 100))
    train = (
        base.filter(F.col("bucket") < 100 - bench_pct)
        .select("doc_id", D.shingle_hashes("text", 3).alias("shingles"))
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )
    bench = (
        base.filter(F.col("bucket") >= 100 - bench_pct)
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
        .filter(F.col("n_shared") >= min_shared)
        .select("doc_id")
        .distinct()
    )
    return (
        df.filter(C.stable_bucket("doc_id", 100) < 100 - bench_pct)
        .join(contaminated, "doc_id", "left_anti")
    )


def _stage_pack_sequences(
    df: DataFrame, docs: DataFrame, *, capacity: int = 256, n_shards: int = 32
) -> DataFrame:
    return C.pack_sequences(df, "text", "doc_id", capacity=capacity, n_shards=n_shards)


def _stage_priority_sample(
    df: DataFrame, docs: DataFrame, *, k: int = 100
) -> DataFrame:
    # DLT weighted subsampling as a pipeline stage: keep k docs with
    # probability proportional to length (the exact-integer priority
    # keys of operators.corpus.priority_sample), preserving the
    # (doc_id, text) stage contract. Weight = char length of the text
    # AT THIS STAGE (post-filter/salvage), floor 1 so empty-adjacent
    # docs stay sampleable.
    from hadoopxmlextractor_spark.operators.corpus import priority_sample

    weighted = df.select(
        "doc_id", "text", F.greatest(F.length("text"), F.lit(1)).alias("_w")
    )
    picked = priority_sample(weighted, "doc_id", "_w", k=k).select("doc_id")
    return df.join(F.broadcast(picked), "doc_id", "left_semi").select(
        "doc_id", "text"
    )


def _stage_line_filter(df: DataFrame, docs: DataFrame, *, min_words: int = 3) -> DataFrame:
    # RefinedWeb-style salvage: rebuild each doc from only its segments
    # with >= min_words words; docs losing every segment drop out. The
    # HOFs sit in a top-level projection (interpreted-lambda rule).
    segs = F.split(F.col("text"), r"\. ")
    kept = F.filter(
        segs,
        lambda seg: (F.size(F.split(F.trim(seg), r"\s+")) >= min_words)
        & (F.trim(seg) != ""),
    )
    return df.select(
        "doc_id", F.array_join(kept, ". ").alias("text")
    ).filter(F.col("text") != "")



def _stage_html_extract(df: DataFrame, docs: DataFrame) -> DataFrame:
    # The WET stage as a declarative pipeline step: `text` arrives as
    # raw HTML (e.g. a WARC response body routed in by the caller) and
    # leaves as the visible text (operators.text.html_text — skip
    # subtrees dropped, charrefs decoded); docs extracting to nothing
    # drop out, keeping the (doc_id, text) stage contract.
    return df.select("doc_id", T.html_text("text").alias("text")).filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    )


STAGES: dict[str, Callable[..., DataFrame]] = {
    "quality_filter": _stage_quality_filter,
    "html_extract": _stage_html_extract,
    "line_filter": _stage_line_filter,
    "dedup_exact": _stage_dedup_exact,
    "classifier_filter": _stage_classifier_filter,
    "decontaminate": _stage_decontaminate,
    "priority_sample": _stage_priority_sample,
    "pack_sequences": _stage_pack_sequences,
}


def compile_pipeline(
    spark: SparkSession,
    sf_dir: str,
    config: dict[str, Any] | str,
    *,
    lint: bool = True,
) -> DataFrame:
    """Validate a pipeline spec and compile it to one lazy plan.

    Compile-time plan lint: after composition the whole plan runs
    through :func:`plans.inspect.lint_plan` — the same scale
    anti-pattern checks the test suite asserts (cartesian product,
    filter never reaching a scan, lost pruning, row-wise Python UDF).
    ``error``-severity findings (all-pairs join shapes) raise here,
    BEFORE any job runs — the 100 TB pre-flight; warnings surface via
    :mod:`warnings` so a misconfigured-but-runnable pipeline still
    compiles. ``lint=False`` opts out (e.g. a deliberately tiny
    cross join). Linting plans the query but executes nothing."""
    if isinstance(config, str):
        config = json.loads(config)
    source = config.get("source", "documents")
    stages = config.get("stages", [])
    if not stages:
        raise ValueError("pipeline config has no stages")
    for spec in stages:
        op = spec.get("op")
        if op not in STAGES:
            raise ValueError(
                f"unknown pipeline stage {op!r}; available: {sorted(STAGES)}"
            )
    docs = load(spark, sf_dir, source)
    df = docs.select("doc_id", "text")
    for spec in stages:
        df = STAGES[spec["op"]](df, docs, **spec.get("params", {}))
    if lint:
        from hadoopxmlextractor_spark.plans.inspect import lint_plan

        findings = lint_plan(df)
        errors = [f for f in findings if f["severity"] == "error"]
        if errors:
            raise ValueError(
                "pipeline plan failed lint: "
                + "; ".join(f"{f['code']}: {f['detail']}" for f in errors)
            )
        for f in findings:
            import warnings

            warnings.warn(
                f"pipeline plan lint [{f['code']}]: {f['detail']}",
                stacklevel=2,
            )
    return df
