"""Streaming event analytics: watermarked windows and sessionization.

Streaming counterparts of the batch ``events_tumbling_window`` /
``events_sessionize`` queries — same logical results when a stream is
replayed, demonstrated in tests with a file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) counts+sums with a watermark so state for
    closed windows is dropped — bounded state at any input scale. Late
    rows within the delay are merged; later ones discarded."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Built-in session windows (gap-based), the streaming-native
    equivalent of the batch lag+running-sum sessionization."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def hopping_window_counts(
    events: DataFrame,
    *,
    window_duration: str = "10 minutes",
    slide_duration: str = "5 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the batch ``events_hopping_window`` query:
    overlapping (hopping) windows — each event is assigned to
    duration/slide windows by the same built-in ``F.window`` overload,
    and the watermark bounds state exactly as in the tumbling case
    (a window's state is dropped once the watermark passes its end,
    overlap notwithstanding)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration, slide_duration).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def enrich_events(events: DataFrame, dim: DataFrame, on: str = "event_type") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension with an explicit broadcast — the stream side never
    shuffles, and the dimension is re-resolved per batch (so a replaced
    underlying table is picked up on the next trigger). Left join keeps
    unmatched events flowing with NULL attributes rather than silently
    dropping them — at pipeline scale a missing dimension row must
    surface downstream, not vanish."""
    return events.join(F.broadcast(dim), on, "left")
