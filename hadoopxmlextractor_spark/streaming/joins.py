"""Stream-stream joins with watermark-bounded state.

A continuously-ingesting pipeline often needs to correlate two live
streams — impressions with conversions, document landings with
moderation verdicts — not a stream with a static table. Structured
Streaming buffers both sides in state; the join TIME BOUND plus the
watermarks are what let it evict: a view older than the watermark minus
the maximum delay can never match a future purchase, so its state is
dropped. Without the time bound the state is unbounded and Spark
rejects the append-mode query outright — the bound is correctness, not
an optimization.

Scale shape: both sides shuffle on the equi-key (user_id — uniform at
event scale), state per key is O(events within the delay window), and
eviction advances with the slower stream's watermark. The batch twin is
``operators.temporal.interval_join`` (same semantics over static
tables, oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_conversions(
    views: DataFrame,
    purchases: DataFrame,
    *,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each purchase to the prior view by the same user within
    ``max_delay`` (view.ts <= purchase.ts <= view.ts + max_delay).
    Returns (user_id, view_ts, purchase_ts, value) in append mode once
    both watermarks pass the match window."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
    )
    return v.join(
        p,
        F.expr(
            f"""
            v_user = p_user AND
            purchase_ts >= view_ts AND
            purchase_ts <= view_ts + INTERVAL {max_delay}
            """
        ),
        "inner",
    ).select(
        F.col("v_user").alias("user_id"), "view_ts", "purchase_ts", "value"
    )
