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


def tumbling_cents(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts_ts",
    by: str = "event_type",
    cents_col: str = "cents",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling per-group event counts + integer-cent value sums — the
    oracle-friendly windowed aggregate (BIGINT sum is order-independent,
    unlike a float sum, so a late-data replay can be compared
    hash-exact). With ``watermark`` set on a streaming input this is
    the canonical watermarked append-mode aggregate: a window emits
    exactly once, when the watermark passes its end; rows arriving
    after their window was finalized are dropped by the engine
    (window_end <= watermark at the row's batch)."""
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len).alias("w"), by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents_col).alias("sum_val_cents"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            by,
            "n_events",
            "sum_val_cents",
        )
    )


def session_cents(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts_ts",
    by: str = "user_id",
    cents_col: str = "cents",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows with integer-cent sums — the
    oracle-friendly session aggregate (BIGINT sum is order-independent,
    so a late-data replay compares hash-exact). With ``watermark`` on a
    streaming input this is the canonical watermarked append-mode
    SESSION aggregate, whose state semantics differ from tumbling in
    every phase (probed on this engine build, r09): proto-sessions
    [ts, ts+gap) MERGE on touch (start <= other end, gap-boundary
    inclusive); late rows drop iff proto-END <= the LAGGED watermark
    (SPARK-24634's two-watermark rule, same as tumbling); eviction
    during batch k emits sessions with end <= the current watermark
    AFTER the batch's rows merged — so a late-but-admitted row whose
    would-be partner session was already evicted starts a NEW session
    (the split batch replays can never show)."""
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents_col).alias("sum_val_cents"),
        )
        .select(
            by,
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "n_events",
            "sum_val_cents",
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
