"""Stream-stream joins (event-time bounded, watermarked).

The reference has no streaming engine (its closest surface is CDF
incremental pulls, `crates/core/src/operations/load_cdf.rs`); Spark's
stream-stream join is the superset operator for the production
attribution shape: two live streams joined on a key within an event-time
range, with state bounded by watermarks instead of growing forever.

Scale: both sides shuffle on the join keys, so state is partitioned
per-key across executors; the watermark + time-range condition lets the
engine evict rows that can no longer match, making total state
O(key-rate x window) instead of O(stream history). On a 1000-executor
cluster this is the only join shape that survives unbounded inputs.

Engine semantics this module's gates pin (probed on this build,
tests/test_streaming.py::test_stream_stream_join_rules):
 - a row is LATE-FILTERED at its arrival batch iff its event time is
   <= the LAGGED global watermark (the watermark in effect one batch
   earlier — SPARK-24634's two-watermark rule, non-strict);
 - the global watermark is min over both sides' (max event time seen
   - delay), advancing once per micro-batch;
 - state eviction is exactly calibrated against the late filter: an
   admitted row always finds its surviving partners, so the late
   filter is the ONLY pair-loss mechanism for an inner join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    upper: str = "2 hours",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) frames on equality keys plus the
    event-time band ``left_ts <= right_ts <= left_ts + upper``.

    ``keys`` is a list of (left_col, right_col) equality pairs — the
    two sides keep their own column names, so the caller's projection
    stays unambiguous. Watermarks attach to streaming inputs only; the
    same call on batch frames is the backfill replay of the identical
    definition (the windows.py convention).
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond: Column = F.lit(True)
    for lc, rc in keys:
        cond = cond & (left[lc] == right[rc])
    cond = (
        cond
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, how)
