"""Event-time window operators (batch + streaming shapes).

The same DataFrame expressions serve both: pass a batch DataFrame for
backfill or a streaming one for live processing — watermarks only attach
in the streaming case. This mirrors how a 100 TB pipeline runs: one
definition, replayed over history and tailed forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts_ts",
    watermark: str | None = None,
) -> DataFrame:
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_value_sums(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts_ts",
    watermark: str | None = None,
) -> DataFrame:
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_aggregates(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts_ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows (dynamic gap-based) with per-session
    aggregates — F.session_window works in both batch and streaming."""
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
