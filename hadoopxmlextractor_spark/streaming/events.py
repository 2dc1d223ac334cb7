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


def funnel_stream(
    events: DataFrame,
    *,
    w1_ms: int,
    w2_ms: int,
    first_type: str = "view",
    second_type: str = "click",
    third_type: str = "purchase",
) -> DataFrame:
    """Streaming TIME-CONSTRAINED funnel — the continuous twin of the
    ``events_funnel_windowed`` batch query: per user, emit one append
    row at each stage completion (the FIRST ``first_type`` ever, the
    first ``second_type`` within ``w1_ms`` of it, the first
    ``third_type`` within ``w2_ms`` of THAT second-stage event).

    Input: streaming (user_id long, event_id long, event_type string,
    ms long). Output (append): (user_id, stage, ms) with stage ∈
    {first,second,third}_type — at most three rows per user ever.

    State is THREE longs per user (the stage anchor timestamps) —
    user-dimension, NOT event-scaled, and deliberately NOT
    TTL-evicted: the funnel anchors on the first-ever stage-1 event,
    so dropping a lapsed user's state would let a later stage-1 event
    re-anchor the funnel and diverge from the batch semantics. A
    keyed 24-byte record per user is the honest cost of
    first-touch semantics (contrast :func:`..dedup.debounce_stream`,
    whose refresh semantics make eviction free).

    In-batch work is a small Python loop over the user's batch rows —
    per-batch-per-user row counts, not corpus-scaled."""
    import pandas as pd  # noqa: F401 (annotation resolution)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _funnel(key, pdfs, state: GroupState):
        if state.exists:
            v_ms, c_ms, p_ms = state.get
        else:
            v_ms = c_ms = p_ms = None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ms", "event_id"])
            for _, row in pdf.iterrows():
                t, ms = row["event_type"], int(row["ms"])
                if t == first_type and v_ms is None:
                    v_ms = ms
                    out.append((int(row["user_id"]), first_type, ms))
                elif (
                    t == second_type
                    and v_ms is not None
                    and c_ms is None
                    and v_ms < ms <= v_ms + w1_ms
                ):
                    c_ms = ms
                    out.append((int(row["user_id"]), second_type, ms))
                elif (
                    t == third_type
                    and c_ms is not None
                    and p_ms is None
                    and c_ms < ms <= c_ms + w2_ms
                ):
                    p_ms = ms
                    out.append((int(row["user_id"]), third_type, ms))
        state.update((v_ms, c_ms, p_ms))
        import pandas as pd

        if out:
            yield pd.DataFrame(out, columns=["user_id", "stage", "ms"])

    return events.groupBy("user_id").applyInPandasWithState(
        _funnel,
        outputStructType="user_id long, stage string, ms long",
        stateStructType="v_ms long, c_ms long, p_ms long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
