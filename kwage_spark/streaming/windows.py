"""Event-time windowed aggregations with watermarks (Structured Streaming).

KWAGE has no stream processor (SURVEY §2.7) — this extends the engine with
the standard streaming surface a large-scale pipeline needs: tumbling /
sliding window rollups with late-data handling via watermark, and
session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          slide: str | None = None,
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling (or sliding) event-time counts per event_type.

    Works on both batch and streaming DataFrames — the same plan does
    late-data-tolerant aggregation under `readStream`.
    """
    win = (F.window("ts", window, slide) if slide else F.window("ts", window))
    # watermarks require an instant (TIMESTAMP), not NTZ; session TZ is UTC
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (src.groupBy(win.alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n", "sum_value"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Session-window aggregation keyed by user (gap-based)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (src.groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select("user_id",
                    F.col("sess.start").alias("sess_start"),
                    F.col("sess.end").alias("sess_end"),
                    "n_events", "sum_value"))
