"""Time-series resample + gap-fill — the hypertable-style rollup the
reference's event-table users run (downsample to a fixed grid, carry
the last observation across empty buckets).

Spark-first shape: one groupBy onto the bucket grid (map-side partial
agg), a per-key ``sequence()`` explode to materialize the empty
buckets (no driver loop, no UDF), and a ``last(ignorenulls)`` running
window for the forward fill. The spine explode emits
O(buckets-per-key) rows per key — at 100 TB the grid is bounded by
time-range/bucket, not by event volume, and every stage stays in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def resample_gap_fill(
    df: DataFrame,
    bucket: str = "hour",
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-``by`` fixed-grid rollup with forward fill: bucket events
    with ``date_trunc(bucket)``, sum the value (quantized to integer
    cents so partial sums are order-independent — the q9 pattern) and
    count events per bucket, then densify each key's [min, max] bucket
    range and carry the last seen sum across empty buckets.

    Returns (by, bucket_ts epoch-seconds, n_events, filled_cents) —
    ``n_events`` is 0 on gap rows, ``filled_cents`` is the forward
    -filled running value (never NULL after a key's first bucket).

    NOTE: this function runs the bucket aggregation EAGERLY at call
    time (localCheckpoint) and returns a checkpoint-backed frame: the
    input is snapshotted as of construction (a later change to the
    source table is not reflected), and the checkpoint blocks live on
    executors without lineage — an executor loss fails downstream jobs
    instead of recomputing. The trade buys a single scan of the events
    table shared by the spine and the fill join.
    """
    step = F.expr(f"INTERVAL 1 {bucket}")
    b = df.select(
        F.col(by),
        F.date_trunc(bucket, F.col(ts_col)).alias("__bucket"),
        F.round(F.col(value_col) * F.lit(100.0)).cast("long").alias("__cents"),
    )
    # the spine's per-key [min, max] derives from the ALREADY-bucketed
    # aggregate (identical extrema — agg's buckets are exactly b's) and
    # the fill join reads it again; pin it (series-grained: |keys| x
    # |buckets| narrow rows, never event-scaled) so the events table is
    # scanned ONCE. Column pruning makes the two consumers' partial
    # aggs differ, so exchange reuse alone cannot deduplicate the scan.
    agg = b.groupBy(by, "__bucket").agg(
        F.sum("__cents").alias("__c"), F.count(F.lit(1)).alias("n_events")
    ).localCheckpoint(eager=True)
    spine = (
        agg.groupBy(by)
        .agg(F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi"))
        .select(
            by,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias(
                "__bucket"
            ),
        )
    )
    joined = spine.join(agg, [by, "__bucket"], "left_outer")
    fill = F.last("__c", ignorenulls=True).over(
        W.partitionBy(by)
        .orderBy("__bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        F.col(by),
        F.unix_timestamp("__bucket").alias("bucket_ts"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        fill.cast("long").alias("filled_cents"),
    )


def trailing_zscore_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "event_type",
    bucket_seconds: int = 3600,
    lookback: int = 24,
    threshold: float = 2.0,
    fill_gaps: bool = True,
) -> DataFrame:
    """Windowed anomaly detection over an event stream: bucket events
    per (group, time bucket), then score each bucket's count against
    the mean/stddev of the PRECEDING ``lookback`` buckets (trailing
    frame — the score never peeks at its own value or the future, so
    the batch definition replays the streaming one). Returns
    (by, bucket_ts, n, z, is_anomaly); z is NULL until two prior
    buckets exist or when the trailing counts are constant.

    With ``fill_gaps`` (default) the per-group bucket series is
    densified to EVERY bucket between the group's first and last event
    before the window runs, so (a) the trailing frame always spans
    ``lookback`` buckets of real wall-clock time, never an arbitrary
    stretch across a gap, and (b) a zero-event bucket — the dropout,
    the anomaly a monitor most needs — gets an n=0 row and can be
    flagged. ``fill_gaps=False`` scores only non-empty buckets (the
    r06 behavior; gaps are skipped and dropouts are out of scope).

    Scale shape: one partial-aggregated groupBy to bucket counts
    (corpus -> |groups| x |buckets| rows); the gap spine is generated
    from a |groups|-row min/max aggregate (grid-bounded, like
    resample_gap_fill — never event-scaled); then one window pass keyed
    by group — the window input is the bucketed series, not the raw
    events, so the sort is tiny regardless of event volume. Skewed
    groups are a non-issue at series granularity.

    NOTE: with ``fill_gaps=True`` the bucket aggregation runs EAGERLY
    at call time (localCheckpoint) and the result is checkpoint-backed:
    the input is snapshotted as of construction, and the blocks live on
    executors without lineage (an executor loss fails downstream jobs
    instead of recomputing) — the trade for a single events scan.
    ``fill_gaps=False`` stays a pure plan builder (no job at call
    time)."""
    sec = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp"))).cast("long")
    bucket = (F.floor(sec / F.lit(bucket_seconds)) * F.lit(bucket_seconds)).cast(
        "long"
    )
    counts = (
        df.select(F.col(by), bucket.alias("bucket_ts"))
        .groupBy(by, "bucket_ts")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if fill_gaps:
        # spine + fill join both read counts — pin the series-grained
        # frame so the raw event table is scanned once (see
        # resample_gap_fill; column pruning defeats exchange reuse here)
        counts = counts.localCheckpoint(eager=True)
        spine = (
            counts.groupBy(by)
            .agg(F.min("bucket_ts").alias("__mn"), F.max("bucket_ts").alias("__mx"))
            .select(
                by,
                F.explode(
                    F.sequence(
                        "__mn", "__mx", F.lit(int(bucket_seconds)).cast("long")
                    )
                ).alias("bucket_ts"),
            )
        )
        counts = spine.join(counts, [by, "bucket_ts"], "left").withColumn(
            "n", F.coalesce("n", F.lit(0).cast("long"))
        )
    w = (
        W.partitionBy(by)
        .orderBy("bucket_ts")
        .rowsBetween(-lookback, -1)
    )
    mu = F.avg(F.col("n").cast("double")).over(w)
    sd = F.stddev_samp(F.col("n").cast("double")).over(w)
    z = F.when(
        sd.isNull() | (sd == F.lit(0.0)), F.lit(None).cast("double")
    ).otherwise(F.round((F.col("n").cast("double") - mu) / sd, 4))
    return counts.select(
        by,
        "bucket_ts",
        F.col("n").cast("long").alias("n"),
        z.alias("z"),
        # a bucket with no usable baseline is NOT an anomaly (non-null
        # boolean -> directly usable as a filter/partition column)
        F.coalesce(F.abs(z) >= F.lit(threshold), F.lit(False)).alias("is_anomaly"),
    )


def _percentile_name(p: float) -> str:
    """Column name for percentile ``p`` derived from its FULL decimal
    repr: 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9, 0.005 -> p0_5.
    The old f"p{int(p*100)}" truncated (0.999 -> p99, colliding with
    0.99; 0.005 -> p0)."""
    from decimal import Decimal

    d = (Decimal(repr(p)) * 100).normalize()
    if d == d.to_integral_value():
        return f"p{int(d)}"
    return "p" + str(d).replace(".", "_")


def value_percentiles(
    df: DataFrame,
    value_col: str = "value",
    by: str = "event_type",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    max_distinct_cents: int | None = 2_000_001,
) -> DataFrame:
    """Exact nearest-rank percentiles per group on the integer-cent
    grid: p-th percentile = the smallest cent value whose cumulative
    count reaches ceil(p * n). Returns one row per group:
    (by, n, p50, p90, p99, ..., coarsened) with values in original
    units (cents / 100).

    Grid semantics are the determinism AND scale contract: quantizing
    to cents first means the ordered window runs over DISTINCT cents
    per group (bounded by the value range x 100 — NEVER by event
    volume; a hot group costs the same as a cold one), the
    cumulative-count reduction gets map-side combine on (group, cent),
    and ties need no arbitrary row order. Exact continuous-value
    quantiles at 100 TB are a per-group sort by construction — use
    approx_percentile for that; this is the exact, replayable monitor
    shape.

    The grid precondition is ENFORCED, not assumed (same treatment as
    text.classifier_auc): an arbitrary caller column (microseconds,
    bytes) can make the cent grid effectively unbounded and recreate
    exactly the corpus-sized single-task window this operator exists
    to avoid. Per-group distinct-cent counts are computed in-plan on
    the already-reduced (group, cent) table; any group above
    ``max_distinct_cents`` has its cents coarsened to equal-width
    integer bins (bin floor) over [min, max] and is flagged
    ``coarsened = true`` in the output — nearest-rank on the coarsened
    grid under-reads by < bin width. Pass ``max_distinct_cents=None``
    to skip (producer guarantees a bounded domain). No driver job runs
    either way — the check is part of the returned plan.

    Rank targets are exact integer arithmetic: ceil(p*n) is computed
    as (p_num*n + p_den-1) div p_den from p's decimal repr, so a
    double ceil can never round a boundary differently from a
    decimal-exact SQL oracle. (p_num * n must fit int64: fine for
    6-decimal percentiles up to ~9e12 rows per group.)

    Cache lifetime: with the guard enabled the returned plan reads a
    lazily persist()-pinned grid-bounded frame (both guard branches
    share it); long-lived sessions composing many queries should call
    ``session.drop_cached_intermediates`` once results are consumed."""
    from decimal import Decimal
    from fractions import Fraction

    names = [_percentile_name(p) for p in percentiles]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentile columns: {names}")
    for p in percentiles:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"percentile out of range (0, 1]: {p}")

    cents = F.floor(F.col(value_col) * F.lit(100.0)).cast("long")
    g = (
        df.select(F.col(by), cents.alias("c"))
        .groupBy(by, "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if max_distinct_cents is not None:
        # NULL group keys are in-contract (SQL GROUP BY keeps them), so
        # the stats join must be null-safe. eqNullSafe over a window:
        # AQE can skew-split a hot-key join but never a hot-key window,
        # and the pre-coarsened distinct-cent domain is exactly the
        # unbounded quantity this guard exists to tame.
        # Pin the (group, cent, cnt) table first: the stats agg and the
        # coarsening join both read it, and column pruning makes their
        # partial aggs differ (no exchange reuse) — without the pin the
        # raw event table is scanned twice. Grid-bounded, never
        # event-scaled (the operator's own scale contract). persist(),
        # not localCheckpoint: under AQE even a lazy checkpoint runs
        # the upstream stages at call time, and the docstring's "no
        # driver job runs either way" must stay true.
        g = g.persist()
        stats = g.groupBy(F.col(by).alias("__k")).agg(
            F.count(F.lit(1)).alias("__nd"),
            F.min("c").alias("__lo"),
            F.max("c").alias("__hi"),
        )
        # integer bin width = ceil(span / bound), >= 1; coarsened cent =
        # bin floor. All-integer so both engines agree bit-for-bit.
        over = F.col("__nd") > F.lit(max_distinct_cents)
        g = (
            g.join(stats, F.col(by).eqNullSafe(F.col("__k")))
            .drop("__k")
            .withColumn(
                "__w",
                F.expr(
                    f"(__hi - __lo + {int(max_distinct_cents)}) div "
                    f"{int(max_distinct_cents)}"
                ),
            )
            .select(
                F.col(by),
                F.when(
                    over,
                    F.col("__lo")
                    + F.expr("((c - __lo) div __w) * __w"),
                ).otherwise(F.col("c")).alias("c"),
                "cnt",
                over.alias("coarsened"),
            )
            .groupBy(by, "c", "coarsened")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        g = g.withColumn("coarsened", F.lit(False))
    wcum = W.partitionBy(by).orderBy("c").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy(by)
    ranked = g.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for p, name in zip(percentiles, names):
        frac = Fraction(Decimal(repr(p)))
        target = F.expr(
            f"(({frac.numerator} * n) + {frac.denominator - 1}) div "
            f"{frac.denominator}"
        )
        aggs.append(
            (
                F.min(F.when(F.col("cum") >= target, F.col("c"))).cast("double")
                / F.lit(100.0)
            ).alias(name)
        )
    aggs.append(F.max("coarsened").alias("coarsened"))
    return ranked.groupBy(by).agg(*aggs)
