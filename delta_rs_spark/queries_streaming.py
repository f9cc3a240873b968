"""Streaming-shaped window queries (batch-replayable -> oracle-checkable).

The window operators in streaming/windows.py are definition-identical in
batch and streaming mode; the driver's oracle checks them in batch
replay over the events table, and tests/test_streaming.py runs the same
definitions as live streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_rs_spark.queries import query
from delta_rs_spark.sources.tpch import load_table
from delta_rs_spark.streaming.windows import (
    session_aggregates,
    sliding_value_sums,
    tumbling_counts,
)


@query(
    "q_events_sliding_window",
    """
    WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS t, value FROM events),
    assigned AS (
      SELECT CAST(floor(epoch(t) / 1800) * 1800 AS BIGINT) AS window_start, value FROM ev
      UNION ALL
      SELECT CAST(floor(epoch(t) / 1800) * 1800 - 1800 AS BIGINT) AS window_start, value FROM ev
    )
    SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM assigned GROUP BY window_start
    """,
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_value_sums(ev, "1 hour", "30 minutes")


@query(
    "q_events_session_agg",
    """
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value, event_id FROM events),
    marked AS (
      SELECT user_id, t, value,
             CASE WHEN lag(t) OVER w IS NULL
                       OR t - lag(t) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    sessions AS (
      SELECT user_id, t, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id,
           CAST(floor(epoch(min(t))) AS BIGINT) AS session_start,
           CAST(floor(epoch(max(t))) + 1800 AS BIGINT) AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_aggregates(ev, "30 minutes")


@query(
    "q_events_tumbling_typed",
    """
    SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev, "1 hour")


@query(
    "q_asof_join_purchases",
    """
    WITH clicks AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events
                    WHERE event_type = 'click'),
    purch AS (SELECT user_id, epoch_ns(ts) AS t, value AS pv FROM events
              WHERE event_type = 'purchase')
    SELECT clicks.event_id, clicks.user_id,
           round(coalesce(purch.pv, -1.0), 2) AS last_purchase_value
    FROM clicks ASOF LEFT JOIN purch
      ON clicks.user_id = purch.user_id AND purch.t <= clicks.t
    """,
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click gets the user's most recent prior
    purchase value (operator: functions/asof.py, union-marker windows)."""
    from pyspark.sql import functions as F

    from delta_rs_spark.functions.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    joined = asof_join(clicks, purchases, on="ts", by="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.round(F.coalesce(F.col("r_pv"), F.lit(-1.0)), 2).alias("last_purchase_value"),
    )


@query(
    "q_events_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON props column -> typed aggregation."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "q_events_gap_fill",
    """
    WITH b AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
                      CAST(round(value * 100.0) AS BIGINT) AS cents
               FROM events),
    agg AS (SELECT user_id, bucket, sum(cents) AS c, count(*) AS n
            FROM b GROUP BY user_id, bucket),
    spine AS (SELECT user_id,
                     unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
              FROM b GROUP BY user_id),
    j AS (SELECT s.user_id, s.bucket, coalesce(a.n, 0) AS n_events, a.c
          FROM spine s LEFT JOIN agg a
            ON s.user_id = a.user_id AND s.bucket = a.bucket)
    SELECT user_id, epoch(bucket)::BIGINT AS bucket_ts,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(last_value(c IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS filled_cents
    FROM j
    """,
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample + forward fill
    (functions/timeseries.resample_gap_fill): hourly per-user buckets
    densified over each user's [min, max] range via sequence()+explode,
    value sums on the integer-cents grid (order-independent), gaps carry
    the last observation with a last(ignorenulls) running window. The
    oracle replays the grid, the spine, and the fill in SQL."""
    from delta_rs_spark.functions.timeseries import resample_gap_fill

    ev = load_table(spark, sf_dir, "events")
    return resample_gap_fill(ev, bucket="hour", by="user_id")


@query(
    "q_events_interval_join",
    """
    WITH e AS (SELECT event_id,
                      CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ls,
                      CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
                           + floor(greatest(value, 0) * 60) AS BIGINT) AS le,
                      CAST(floor(value * 100) AS BIGINT) AS cents
               FROM events),
    b AS (SELECT CAST(floor(min(ls) / 3600.0) * 3600 AS BIGINT) AS h0,
                 CAST(floor(max(ls) / 3600.0) * 3600 AS BIGINT) AS h1
          FROM e),
    w AS (SELECT unnest(range(h0, h1 + 1, 3600)) AS rs FROM b),
    j AS (SELECT w.rs, e.event_id, e.cents
          FROM w JOIN e ON e.ls <= w.rs + 899 AND w.rs <= e.le)
    SELECT rs AS w_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_val_cents
    FROM j GROUP BY rs
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via the bucketized equi-join strategy
    (functions/rangejoin.py): each event spans [ts, ts + value minutes],
    joined against the first-15-minutes window of every hour in the
    stream's range (window table generated declaratively from one
    min/max aggregate — no driver collect). The naive theta-join plan
    would be a nested-loop product; bucketizing makes it a shuffled
    hash join on the hour key. The oracle runs the plain non-equi join
    in DuckDB — same pairs, different algorithm."""
    from pyspark.sql import functions as F

    from delta_rs_spark.functions.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp("ts_ts")).cast("long")
    e = ev.withColumn("ts_ts", F.col("ts").cast("timestamp")).select(
        F.col("event_id"),
        sec.alias("ls"),
        (sec + F.floor(F.greatest(F.col("value"), F.lit(0.0)) * 60).cast("long")).alias("le"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = e.agg(
        (F.floor(F.min("ls") / 3600.0) * 3600).cast("long").alias("h0"),
        (F.floor(F.max("ls") / 3600.0) * 3600).cast("long").alias("h1"),
    )
    wins = bounds.select(
        F.explode(F.sequence("h0", "h1", F.lit(3600).cast("long"))).alias("rs")
    ).withColumn("re", F.col("rs") + F.lit(899).cast("long"))
    joined = interval_join(e, wins, "ls", "le", "rs", "re", bucket_width=3600)
    return joined.groupBy(F.col("rs").alias("w_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_val_cents"),
    )


@query(
    "q_events_anomaly_zscore",
    """
    WITH e AS (SELECT event_type,
                      CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 3600)
                           * 3600 AS BIGINT) AS bucket_ts
               FROM events),
    c AS (SELECT event_type, bucket_ts, count(*)::BIGINT AS n
          FROM e GROUP BY 1, 2),
    spine AS (SELECT event_type,
                     unnest(generate_series(mn, mx, 3600)) AS bucket_ts
              FROM (SELECT event_type, min(bucket_ts) AS mn,
                           max(bucket_ts) AS mx
                    FROM c GROUP BY 1)),
    cf AS (SELECT s.event_type, s.bucket_ts,
                  coalesce(c.n, 0)::BIGINT AS n
           FROM spine s
           LEFT JOIN c ON s.event_type = c.event_type
                      AND s.bucket_ts = c.bucket_ts),
    s AS (SELECT event_type, bucket_ts, n,
                 avg(n::DOUBLE) OVER w AS mu,
                 stddev_samp(n::DOUBLE) OVER w AS sd
          FROM cf
          WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, bucket_ts, n,
           CASE WHEN sd IS NULL OR sd = 0 THEN NULL
                ELSE round((n::DOUBLE - mu) / sd, 4) END AS z,
           coalesce(CASE WHEN sd IS NULL OR sd = 0 THEN NULL
                         ELSE abs(round((n::DOUBLE - mu) / sd, 4)) >= 2.0 END,
                    FALSE) AS is_anomaly
    FROM s
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly detection over the event stream
    (timeseries.trailing_zscore_anomalies): hourly per-type counts
    scored against the preceding 24 buckets' mean/stddev — the trailing
    frame never reads its own bucket, so the batch definition is the
    streaming one. The per-type series is gap-filled to n=0 buckets
    first, so the trailing frame spans real wall-clock time and a
    zero-event hour (dropout) is scoreable. The oracle replays
    bucketing, the generate_series spine, the trailing frame, and the
    guarded z-score in SQL."""
    from delta_rs_spark.functions.timeseries import trailing_zscore_anomalies

    ev = load_table(spark, sf_dir, "events")
    return trailing_zscore_anomalies(
        ev, ts_col="ts", by="event_type", bucket_seconds=3600, lookback=24
    )


@query(
    "llm_stream_stateful_dedup",
    """
    WITH s AS (SELECT doc_id, doc_id % 3 AS b,
                      md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
               FROM documents),
    cand AS (SELECT fp, b, min(doc_id) AS doc_id FROM s GROUP BY fp, b),
    first AS (SELECT fp, min(b) AS b0 FROM cand GROUP BY fp)
    SELECT c.fp AS fingerprint, c.doc_id
    FROM cand c JOIN first f ON c.fp = f.fp AND c.b = f.b0
    """,
)
def llm_stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch stateful streaming dedup (streaming/stateful.py
    dedup_stream, applyInPandasWithState): a REAL structured stream —
    file source, one parquet file per micro-batch, modification times
    forced so batch order is doc_id % 3 = 0, 1, 2, availableNow
    trigger — emits only the first row ever seen per fingerprint across
    batches into a memory sink. Each batch is pre-deduped to its min-id
    row per fingerprint (within-batch arrival order inside a pandas
    group is not deterministic; cross-batch state is what this gate
    pins — within-batch first-row selection is pytest territory). The
    oracle computes the same first-batch winner per fingerprint in SQL."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from delta_rs_spark.functions.text import fingerprint
    from delta_rs_spark.streaming.stateful import dedup_stream

    docs = load_table(spark, sf_dir, "documents")
    rows = (
        docs.select(
            fingerprint("text").alias("fingerprint"),
            "doc_id",
            (F.col("doc_id") % 3).alias("b"),
        )
        .groupBy("fingerprint", "b")
        .agg(F.min("doc_id").alias("doc_id"))
    )

    tag = _os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/delta_rs_spark_oracle/{tag}/stream_stateful_dedup_{_os.getpid()}"
    stream_dir = f"{root}/in"
    # staging is deterministic per sf_dir -> cached per process (setup,
    # not the measured stream; a fresh process always rebuilds)
    if root not in _STAGED_STREAM_DIRS:
        _shutil.rmtree(root, ignore_errors=True)
        _os.makedirs(stream_dir, exist_ok=True)
        for b in (0, 1, 2):
            staging = f"{root}/stage{b}"
            rows.filter(F.col("b") == b).select("fingerprint", "doc_id").coalesce(
                1
            ).write.parquet(staging)
            part = next(
                p for p in _os.listdir(staging) if p.endswith(".parquet")
            )
            dst = f"{stream_dir}/b{b}.parquet"
            _os.rename(f"{staging}/{part}", dst)
            _shutil.rmtree(staging, ignore_errors=True)
            # FileStreamSource orders by modification time: pin batch order
            _os.utime(dst, (1_600_000_000 + b * 100, 1_600_000_000 + b * 100))
        _STAGED_STREAM_DIRS.add(root)

    src = (
        spark.readStream.schema("fingerprint string, doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    global _STATEFUL_GATE_SEQ
    _STATEFUL_GATE_SEQ += 1
    # r13: pinned state partitions like the other stateful gates (ran
    # at the session's 32 before — 4x the state-store commit files per
    # micro-batch; applyInPandasWithState groups by key, so the
    # partition count never changes which rows win)
    return _run_gate_stream(
        spark,
        dedup_stream(src, key_col="fingerprint"),
        "stateful_dedup_gate",
        root,
        _STATEFUL_GATE_SEQ,
        # r13 A/B: unlike the JVM state-store gates (where fewer
        # partitions -> fewer per-batch commit files wins), this gate
        # is applyInPandasWithState — each state partition is a
        # concurrent Python worker, and 4 measured ~0.8s SLOWER than 8
        # in both A/B legs. Python-boundary parallelism dominates here.
        state_partitions=8,
    ).select("fingerprint", "doc_id")


def _drain_memory_sink(spark: SparkSession, sink: str) -> DataFrame:
    """Read a completed memory-sink table and DROP it (r08 verdict
    hygiene: per-invocation sink tables otherwise accumulate for the
    life of the session). Stream-gate results are a few aggregate rows,
    so the local copy is model-sized, never data-sized."""
    out = spark.table(sink)
    rows, schema = out.collect(), out.schema
    spark.catalog.dropTempView(sink)
    return spark.createDataFrame(rows, schema)


_STATEFUL_GATE_SEQ = 0


@query(
    "q_events_value_percentiles",
    """
    WITH g AS (SELECT event_type,
                      CAST(floor(value * 100.0) AS BIGINT) AS c,
                      count(*)::BIGINT AS cnt
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, c, cnt,
                 sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                                ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(cnt) OVER (PARTITION BY event_type) AS n,
                 count(*) OVER (PARTITION BY event_type) AS ndc
          FROM g)
    SELECT event_type,
           max(n)::BIGINT AS n,
           min(CASE WHEN cum >= ceil(0.5 * n) THEN c END)::DOUBLE / 100.0 AS p50,
           min(CASE WHEN cum >= ceil(0.9 * n) THEN c END)::DOUBLE / 100.0 AS p90,
           min(CASE WHEN cum >= ceil(0.99 * n) THEN c END)::DOUBLE / 100.0 AS p99,
           -- the engine's enforced grid bound: a group whose distinct-
           -- cent count exceeds 2,000,001 is coarsened and flagged;
           -- the events value domain stays far below it (cents here
           -- live in a bounded SLO range), so this replays the flag
           -- computation, not a constant
           (max(ndc) > 2000001) AS coarsened
    FROM r GROUP BY 1
    """,
)
def q_events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p50/p90/p99 of event value per type on the
    integer-cent grid (timeseries.value_percentiles) — the latency/value
    SLO monitor shape. The grid makes the ordered window DISTINCT-cents
    sized (never event-volume sized — a hot type costs the same as a
    cold one) and removes tie ambiguity; the oracle replays the grid,
    the cumulative counts, and the nearest-rank picks."""
    from delta_rs_spark.functions.timeseries import value_percentiles

    ev = load_table(spark, sf_dir, "events")
    return value_percentiles(ev)


_LATE_GATE_SEQ = 0
# process-lifetime cache of staged stream-input dirs (setup, not the
# measured stream); keyed by scratch root, so a fresh process — the
# driver's correctness gate — always rebuilds from the source tables
_STAGED_STREAM_DIRS: set[str] = set()


@query(
    "q_events_late_watermark",
    """
    WITH raw AS (SELECT event_id,
                        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
                        event_type,
                        CAST(floor(value * 100) AS BIGINT) AS cents
                 FROM events),
    bounds AS (SELECT min(sec) AS mn, max(sec) AS mx FROM raw),
    -- arrival batch: three time-chunks of the stream, with every 50th
    -- event displaced into the LAST batch (chunk-0 stragglers arrive
    -- two batches late -> genuinely beyond the watermark's grace)
    e AS (SELECT r.event_id, r.sec, r.event_type, r.cents,
                 CASE WHEN r.event_id % 50 = 0 THEN 2
                      ELSE least(((r.sec - b.mn) * 3) // (b.mx - b.mn + 1), 2)
                 END AS arr,
                 (r.sec // 3600) * 3600 AS ws
          FROM raw r CROSS JOIN bounds b),
    -- Spark's TWO-watermark rule (SPARK-24634, verified on this engine
    -- build): late-event FILTERING in batch k uses the watermark of
    -- batch k-1 (max event time through batch k-2, minus the delay),
    -- while EVICTION/emission in batch k uses the current watermark
    -- (max through batch k-1, minus delay); both compare window END
    -- with <=, and a trailing no-data batch finalizes every window the
    -- final watermark passed
    bm AS (SELECT arr, max(sec) AS bmax FROM e GROUP BY arr),
    wmt AS (SELECT arr,
                   max(bmax) OVER (ORDER BY arr
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 2 PRECEDING) - 1800 AS wm_late,
                   max(bmax) OVER (ORDER BY arr) - 1800 AS wm_after
            FROM bm),
    surv AS (SELECT e.ws, e.event_type, e.cents
             FROM e JOIN wmt ON e.arr = wmt.arr
             WHERE wmt.wm_late IS NULL OR e.ws + 3600 > wmt.wm_late),
    fin AS (SELECT max(wm_after) AS final_wm FROM wmt)
    SELECT s.ws AS window_start, s.event_type,
           count(*)::BIGINT AS n_events,
           sum(s.cents)::BIGINT AS sum_val_cents
    FROM surv s CROSS JOIN fin f
    WHERE s.ws + 3600 <= f.final_wm
    GROUP BY 1, 2
    """,
)
def q_events_late_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order late-data semantics under a REAL watermarked stream
    (streaming/windows.py tumbling_cents): the events table is split
    into three time-chunk files with every 50th event displaced into
    the LAST batch, streamed through a file source with pinned
    modification times (one file per micro-batch, availableNow), a
    30-minute watermark, and an append-mode tumbling 1-hour aggregate
    into a memory sink. This is the one streaming behavior the
    event-time-ordered batch replays never exercise — and the drop
    rule is subtler than the docs' summary (probed on this engine
    build, SPARK-24634): late events are filtered against the
    PREVIOUS batch's watermark while eviction uses the current one, so
    chunk-0 stragglers arriving two batches late are DROPPED
    (window_end <= lagged wm), chunk-1 stragglers arriving one batch
    late are ADMITTED into still-live state even when the current
    watermark already passed their window, and trailing windows the
    final watermark never passed are withheld by append mode. The
    oracle replays the per-batch max event times, the two lagged
    watermarks, the drop rule, and the final-watermark emission rule
    in SQL."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from delta_rs_spark.streaming.windows import tumbling_cents

    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp("ts_ts")).cast("long")
    base = ev.select(
        "event_id",
        "ts_ts",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        sec.alias("sec"),
    )
    bounds = base.agg(F.min("sec").alias("mn"), F.max("sec").alias("mx"))
    arr = F.when(F.col("event_id") % 50 == 0, F.lit(2).cast("long")).otherwise(
        F.least(F.expr("((sec - mn) * 3) div (mx - mn + 1)"), F.lit(2).cast("long"))
    )
    staged = base.crossJoin(F.broadcast(bounds)).select(
        "ts_ts", "event_type", "cents", arr.alias("arr")
    )

    tag = _os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/delta_rs_spark_oracle/{tag}/late_watermark_{_os.getpid()}"
    stream_dir = f"{root}/in"
    # File STAGING is deterministic per sf_dir and is setup, not the
    # measured stream — cache it per process (bench re-invokes the
    # gate; the stream + state store below always run fresh)
    if root not in _STAGED_STREAM_DIRS:
        _shutil.rmtree(root, ignore_errors=True)
        _os.makedirs(stream_dir, exist_ok=True)
        for b in (0, 1, 2):
            staging = f"{root}/stage{b}"
            staged.filter(F.col("arr") == b).select(
                "ts_ts", "event_type", "cents"
            ).coalesce(1).write.parquet(staging)
            part = next(p for p in _os.listdir(staging) if p.endswith(".parquet"))
            dst = f"{stream_dir}/b{b}.parquet"
            _os.rename(f"{staging}/{part}", dst)
            _shutil.rmtree(staging, ignore_errors=True)
            # FileStreamSource orders by modification time: pin batch order
            _os.utime(dst, (1_600_000_000 + b * 100, 1_600_000_000 + b * 100))
        _STAGED_STREAM_DIRS.add(root)

    src = (
        spark.readStream.schema("ts_ts timestamp, event_type string, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    global _LATE_GATE_SEQ
    _LATE_GATE_SEQ += 1
    # r13: route through _run_gate_stream so the state partition count
    # is pinned like every other stateful gate (this one ran at the
    # session's 32 — 4x the state-store commit files per micro-batch
    # for identical results; the count is semantics-independent)
    return _run_gate_stream(
        spark,
        tumbling_cents(src, watermark="30 minutes"),
        "late_watermark_gate",
        root,
        _LATE_GATE_SEQ,
    )


_SESSION_GATE_SEQ = 0


@query(
    "q_events_session_watermark",
    """
    WITH raw AS (SELECT event_id,
                        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
                        user_id,
                        CAST(floor(value * 100) AS BIGINT) AS cents
                 FROM events
                 WHERE user_id % 4 = 0),
    bounds AS (SELECT min(sec) AS mn, max(sec) AS mx FROM raw),
    e AS (SELECT r.event_id, r.sec, r.user_id, r.cents,
                 CASE WHEN r.event_id % 50 = 0 THEN 2
                      ELSE least(((r.sec - b.mn) * 3) // (b.mx - b.mn + 1), 2)
                 END AS arr
          FROM raw r CROSS JOIN bounds b),
    -- the three watermarks of the replay (max event time through the
    -- named batches, minus the 30-min delay; stats include rows the
    -- stateful operator later drops):
    --   wm1 = through batch 0  (eviction wm of batch 1, ADMISSION lag of batch 2)
    --   wm2 = through batch 1  (eviction wm of batch 2)
    --   wmf = through batch 2  (the trailing no-data batch's final eviction)
    bm AS (SELECT arr, max(sec) AS bmax FROM e GROUP BY arr),
    wm AS (SELECT max(CASE WHEN arr <= 0 THEN bmax END) - 1800 AS wm1,
                  max(CASE WHEN arr <= 1 THEN bmax END) - 1800 AS wm2,
                  max(bmax) - 1800 AS wmf
           FROM bm),
    -- S1: session state after batch 1 merged (batches 0-1 are never
    -- late-filtered; batch 0's eviction wm is undefined, so
    -- islands(S0 UNION adm1) == islands(batch0 UNION batch1) rows).
    -- Proto-sessions [sec, sec+1800); touch MERGES (start <= prior end).
    p01 AS (SELECT user_id, sec AS st, sec + 1800 AS en,
                   1 AS n, cents AS val
            FROM e WHERE arr <= 1),
    i1a AS (SELECT *, max(en) OVER (PARTITION BY user_id ORDER BY st, en
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM p01),
    i1b AS (SELECT *, CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END AS brk
            FROM i1a),
    i1c AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY st, en
                     ROWS UNBOUNDED PRECEDING) AS g FROM i1b),
    s1 AS (SELECT user_id, min(st) AS st, max(en) AS en,
                  sum(n)::BIGINT AS n, sum(val)::BIGINT AS val
           FROM i1c GROUP BY user_id, g),
    -- batch-1 eviction: emit end <= wm1 (NON-strict, probed), keep rest
    e1 AS (SELECT s1.* FROM s1, wm WHERE s1.en <= wm.wm1),
    r1 AS (SELECT s1.* FROM s1, wm WHERE s1.en > wm.wm1),
    -- batch 2 admission: two-watermark rule — proto-END must beat the
    -- LAGGED watermark (wm1, max through batch 0), not the current one
    p2 AS (SELECT user_id, sec AS st, sec + 1800 AS en, 1 AS n, cents AS val
           FROM e, wm WHERE arr = 2 AND sec + 1800 > wm.wm1),
    -- S2 = islands(surviving state UNION admitted batch-2 rows): an
    -- admitted straggler whose would-be partner session was already
    -- EVICTED in e1 starts a NEW session here — the split only a real
    -- per-batch replay shows
    u2 AS (SELECT user_id, st, en, n, val FROM r1
           UNION ALL SELECT user_id, st, en, n, val FROM p2),
    i2a AS (SELECT *, max(en) OVER (PARTITION BY user_id ORDER BY st, en
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM u2),
    i2b AS (SELECT *, CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END AS brk
            FROM i2a),
    i2c AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY st, en
                     ROWS UNBOUNDED PRECEDING) AS g FROM i2b),
    s2 AS (SELECT user_id, min(st) AS st, max(en) AS en,
                  sum(n)::BIGINT AS n, sum(val)::BIGINT AS val
           FROM i2c GROUP BY user_id, g),
    e2 AS (SELECT s2.* FROM s2, wm WHERE s2.en <= wm.wm2),
    -- trailing no-data batch: final watermark evicts; later sessions
    -- stay withheld in state (append mode emits exactly once)
    e3 AS (SELECT s2.* FROM s2, wm
           WHERE s2.en > wm.wm2 AND s2.en <= wm.wmf),
    outp AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
             UNION ALL SELECT * FROM e3)
    SELECT user_id, st AS session_start, en AS session_end,
           n AS n_events, val AS sum_val_cents
    FROM outp
    """,
)
def q_events_session_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked SESSION windows under a REAL late-data stream
    (streaming/windows.py session_cents, r09 verdict #4): same staged
    arrival as q_events_late_watermark — three time-chunk files with
    every 50th event displaced two batches late, mtime-pinned order,
    availableNow, 30-min watermark, append mode — but session state
    semantics differ from tumbling in every phase, all probed on this
    engine build: proto-sessions [ts, ts+gap) MERGE on touch
    (gap-boundary inclusive); late rows drop iff proto-end <= the
    LAGGED watermark (the SPARK-24634 two-watermark rule); eviction
    during a batch emits sessions with end <= the CURRENT watermark
    AFTER that batch's rows merged, so an admitted straggler whose
    partner session was already evicted starts a NEW session — the
    gap-merge split no batch replay can exhibit. Event times are
    floored to whole seconds AT STAGING so every boundary comparison
    is integer-exact in both engines. The oracle unrolls the 3-batch
    replay: per-batch max event times, the three watermarks, the
    admission filter, two islands-merge passes with the batch-1
    eviction between them, and the final-watermark emission."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from delta_rs_spark.streaming.windows import session_cents

    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp("ts_ts")).cast("long")
    # quarter of the users: session-state SEMANTICS are user-count
    # independent, but the state store's size is not — the full sf0.1
    # population costs ~27 s of pure state churn for the same pinned
    # behavior (the late_watermark gate keeps the full-stream shape)
    base = ev.filter(F.col("user_id") % 4 == 0).select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        sec.alias("sec"),
    )
    bounds = base.agg(F.min("sec").alias("mn"), F.max("sec").alias("mx"))
    arr = F.when(F.col("event_id") % 50 == 0, F.lit(2).cast("long")).otherwise(
        F.least(F.expr("((sec - mn) * 3) div (mx - mn + 1)"), F.lit(2).cast("long"))
    )
    staged = base.crossJoin(F.broadcast(bounds)).select(
        F.timestamp_seconds(F.col("sec")).alias("ts_ts"),
        "user_id",
        "cents",
        arr.alias("arr"),
    )

    tag = _os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/delta_rs_spark_oracle/{tag}/session_watermark_{_os.getpid()}"
    stream_dir = f"{root}/in"
    if root not in _STAGED_STREAM_DIRS:
        _shutil.rmtree(root, ignore_errors=True)
        _os.makedirs(stream_dir, exist_ok=True)
        for b in (0, 1, 2):
            staging = f"{root}/stage{b}"
            staged.filter(F.col("arr") == b).select(
                "ts_ts", "user_id", "cents"
            ).coalesce(1).write.parquet(staging)
            part = next(p for p in _os.listdir(staging) if p.endswith(".parquet"))
            dst = f"{stream_dir}/b{b}.parquet"
            _os.rename(f"{staging}/{part}", dst)
            _shutil.rmtree(staging, ignore_errors=True)
            _os.utime(dst, (1_600_000_000 + b * 100, 1_600_000_000 + b * 100))
        _STAGED_STREAM_DIRS.add(root)

    src = (
        spark.readStream.schema("ts_ts timestamp, user_id long, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    global _SESSION_GATE_SEQ
    _SESSION_GATE_SEQ += 1
    sink = f"session_watermark_gate_{_os.getpid()}_{_SESSION_GATE_SEQ}"
    ckpt = f"{root}/ckpt{_SESSION_GATE_SEQ}"
    _shutil.rmtree(ckpt, ignore_errors=True)
    # Few state partitions, not the session default 32: the partition
    # count is frozen into the checkpoint at stream start, and 32
    # state-store instances x 3 micro-batches of commit/snapshot files
    # is pure floor for a subset-sized input (semantics are partition-
    # count independent; see _gate_state_partitions). Restored in
    # finally — the conf is read at stream START, so the narrow window
    # cannot leak into a concurrent batch query's plan in this
    # single-threaded gate.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(_gate_state_partitions())
        )
        q = (
            session_cents(src, gap="30 minutes", watermark="30 minutes")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # the partition count is frozen into the state metadata at the
        # FIRST batch's planning, which runs async after start() — keep
        # the conf pinned until the stream drains
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return _drain_memory_sink(spark, sink)


def _stage_batch_files(df, root: str, arr_col: str, cols: list[str]) -> str:
    """Write one mtime-pinned parquet file per arrival batch (0, 1, 2)
    under ``root/in`` for a FileStreamSource with maxFilesPerTrigger=1 —
    the shared staging shape of every real-stream gate. Cached per
    process via _STAGED_STREAM_DIRS (setup, not the measured stream; a
    fresh process — the driver's gate — always rebuilds)."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    stream_dir = f"{root}/in"
    if root not in _STAGED_STREAM_DIRS:
        _shutil.rmtree(root, ignore_errors=True)
        _os.makedirs(stream_dir, exist_ok=True)
        # ONE job stages all three batch files: a single-task
        # partitionBy(arr) write emits one part file per batch value
        # (vs. three filtered writes each re-running the base plan)
        staging = f"{root}/stage"
        df.select(*cols, arr_col).repartition(1).write.partitionBy(
            arr_col
        ).parquet(staging)
        for b in (0, 1, 2):
            part_dir = f"{staging}/{arr_col}={b}"
            dst = f"{stream_dir}/b{b}.parquet"
            if not _os.path.isdir(part_dir):
                # a batch with no rows still needs its file (the gates'
                # 3-batch arrival structure is part of the contract)
                empty = f"{root}/stage_empty{b}"
                df.select(*cols).limit(0).coalesce(1).write.parquet(empty)
                part_dir = empty
            part = next(
                p for p in _os.listdir(part_dir) if p.endswith(".parquet")
            )
            _os.rename(f"{part_dir}/{part}", dst)
            if part_dir != f"{staging}/{arr_col}={b}":
                _shutil.rmtree(part_dir, ignore_errors=True)
            # FileStreamSource orders by modification time: pin batch order
            _os.utime(dst, (1_600_000_000 + b * 100, 1_600_000_000 + b * 100))
        _shutil.rmtree(staging, ignore_errors=True)
        _STAGED_STREAM_DIRS.add(root)
    return stream_dir


def _gate_state_partitions() -> int:
    """State partition count for the stream gates. Pinned small for
    subset-sized gate inputs — the count is frozen into the checkpoint
    at stream start and N state stores x M micro-batches of
    commit/snapshot files is pure floor (semantics are partition-count
    independent). Scale-dependent: a production deployment with large
    keyed state raises it via SPARK_GRAFT_STREAM_STATE_PARTITIONS; the
    local default (4) is the measured r13 A/B winner at gate-scale
    state (8 -> 4 shaved the per-batch state-store commit fan-out with
    identical results; 2 was not reliably better and halves state
    parallelism, so 4 stays)."""
    import os as _os

    try:
        return max(
            1, int(_os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "4"))
        )
    except ValueError:
        return 4


def _run_gate_stream(spark, out_df, sink_prefix: str, root: str, seq: int,
                     state_partitions: int | None = None):
    """Drive a gate's streaming plan to completion (availableNow, memory
    sink, fresh checkpoint) and return the drained result. The state
    partition count comes from _gate_state_partitions() (pinned small
    for subset-sized gate inputs; env-tunable for scale); restored in
    finally."""
    import os as _os
    import shutil as _shutil

    if state_partitions is None:
        state_partitions = _gate_state_partitions()

    sink = f"{sink_prefix}_{_os.getpid()}_{seq}"
    ckpt = f"{root}/ckpt{seq}"
    _shutil.rmtree(ckpt, ignore_errors=True)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            out_df.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return _drain_memory_sink(spark, sink)


_SSJ_GATE_SEQ = 0


@query(
    "q_events_stream_stream_join",
    """
    WITH raw AS (SELECT event_id, user_id, event_type,
                        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
                        CAST(floor(value * 100) AS BIGINT) AS cents
                 FROM events
                 WHERE event_type IN ('click', 'purchase')),
    bounds AS (SELECT min(sec) AS mn, max(sec) AS mx FROM raw),
    e AS (SELECT r.event_id, r.user_id, r.event_type, r.sec, r.cents,
                 CASE WHEN r.event_id % 25 = 0 THEN 2
                      ELSE least(((r.sec - b.mn) * 3) // (b.mx - b.mn + 1), 2)
                 END AS arr
          FROM raw r CROSS JOIN bounds b),
    -- each side's watermark node tracks its OWN running max event time
    -- (over every row in the batch file, including rows the join later
    -- drops as late); the global watermark is the MIN of the two nodes,
    -- and late-input filtering in batch k uses the LAGGED global
    -- watermark (through batch k-2, SPARK-24634), non-strict
    bm AS (SELECT arr,
                  max(CASE WHEN event_type = 'click' THEN sec END) AS lmax,
                  max(CASE WHEN event_type = 'purchase' THEN sec END) AS rmax
           FROM e GROUP BY arr),
    wmr AS (SELECT arr,
                   CASE WHEN rl2 IS NULL OR rr2 IS NULL THEN NULL
                        ELSE least(rl2, rr2) - 1800 END AS wm_lag
            FROM (SELECT arr,
                         max(lmax) OVER (ORDER BY arr
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) AS rl2,
                         max(rmax) OVER (ORDER BY arr
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) AS rr2
                  FROM bm)),
    -- state eviction is calibrated against the late filter (probed on
    -- this engine build): an admitted row always finds its surviving
    -- partners, so admission is the ONLY pair-loss mechanism
    adm AS (SELECT e.* FROM e JOIN wmr ON e.arr = wmr.arr
            WHERE wmr.wm_lag IS NULL OR e.sec > wmr.wm_lag),
    pairs AS (SELECT c.event_id AS click_id,
                     p.event_id AS purchase_id,
                     c.user_id,
                     p.cents AS purchase_cents
              FROM adm c JOIN adm p
                ON c.event_type = 'click' AND p.event_type = 'purchase'
               AND c.user_id = p.user_id
               AND p.sec >= c.sec AND p.sec <= c.sec + 14400),
    -- LEFT OUTER null emission (probed): an admitted, never-matched
    -- click emits its NULL-padded row only once the FINAL watermark
    -- STRICTLY passes its last possible match time (sec + 4h); later
    -- unmatched clicks stay withheld in state (append mode emits
    -- exactly once). Compare the non-strict (<=) late filter above —
    -- the two bounds differ, and the gate pins both.
    fin AS (SELECT least(max(lmax), max(rmax)) - 1800 AS wm_final FROM bm)
    SELECT click_id, purchase_id, user_id, purchase_cents FROM pairs
    UNION ALL
    SELECT c.event_id AS click_id,
           CAST(NULL AS BIGINT) AS purchase_id,
           c.user_id,
           CAST(NULL AS BIGINT) AS purchase_cents
    FROM adm c CROSS JOIN fin f
    WHERE c.event_type = 'click'
      AND c.sec + 14400 < f.wm_final
      AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.click_id = c.event_id)
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM left-outer join under a REAL late-data
    stream (streaming/joins.py stream_stream_interval_join): the
    production attribution shape — a clicks stream joined with a
    purchases stream on user within [click, click + 4h], unconverted
    clicks surfacing as NULL-padded rows. Both sides are staged into
    three time-chunk files with every 25th event displaced into the
    LAST batch (mtime-pinned order, one file per micro-batch per side,
    availableNow), each side watermarked 30 minutes. This is the JOIN
    behavior batch replays can't exercise — all probed on this build
    (tests/test_streaming.py): per-side watermark nodes feeding a MIN
    global watermark; late stragglers filtered against the LAGGED
    watermark (SPARK-24634, NON-strict); join state eviction exactly
    calibrated so the late filter is the only pair-loss mechanism (an
    admitted straggler on EITHER side still finds its surviving
    partners in the other side's state); and outer-null emission for a
    never-matched click only once the final watermark STRICTLY passes
    its last possible match time — clicks nearer the stream's end stay
    withheld (append mode emits exactly once). The oracle replays the
    per-side per-batch maxes, the min-combine, the lagged admission
    rule, the surviving pair set, and the strict null-emission bound
    in SQL."""
    import os as _os

    from pyspark.sql import functions as F

    from delta_rs_spark.streaming.joins import stream_stream_interval_join

    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))).cast("long")
    base = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "event_type",
        sec.alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = base.agg(F.min("sec").alias("mn"), F.max("sec").alias("mx"))
    arr = F.when(F.col("event_id") % 25 == 0, F.lit(2).cast("long")).otherwise(
        F.least(F.expr("((sec - mn) * 3) div (mx - mn + 1)"), F.lit(2).cast("long"))
    )
    staged = base.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_seconds(F.col("sec")).alias("ts_ts"),
        "cents",
        arr.alias("arr"),
    )

    tag = _os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/delta_rs_spark_oracle/{tag}/stream_stream_join_{_os.getpid()}"
    # both sides' staging filters share one computation of the base plan
    staged = staged.persist()
    try:
        l_dir = _stage_batch_files(
            staged.filter(F.col("event_type") == "click"),
            f"{root}/L",
            "arr",
            ["event_id", "user_id", "ts_ts"],
        )
        r_dir = _stage_batch_files(
            staged.filter(F.col("event_type") == "purchase"),
            f"{root}/R",
            "arr",
            ["event_id", "user_id", "ts_ts", "cents"],
        )
    finally:
        staged.unpersist()

    lsrc = (
        spark.readStream.schema("event_id long, user_id long, ts_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(l_dir)
        .selectExpr("event_id AS click_id", "user_id AS l_user", "ts_ts AS lts")
    )
    rsrc = (
        spark.readStream.schema(
            "event_id long, user_id long, ts_ts timestamp, cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(r_dir)
        .selectExpr(
            "event_id AS purchase_id", "user_id AS r_user", "ts_ts AS rts", "cents"
        )
    )
    joined = stream_stream_interval_join(
        lsrc,
        rsrc,
        keys=[("l_user", "r_user")],
        left_ts="lts",
        right_ts="rts",
        upper="4 hours",
        watermark="30 minutes",
        how="leftOuter",
    ).select(
        "click_id",
        "purchase_id",
        F.col("l_user").alias("user_id"),
        F.col("cents").alias("purchase_cents"),
    )
    global _SSJ_GATE_SEQ
    _SSJ_GATE_SEQ += 1
    return _run_gate_stream(
        spark, joined, "stream_stream_join_gate", root, _SSJ_GATE_SEQ
    )


_ENRICH_GATE_SEQ = 0


def _make_enrich_handler(spark, dim_path: str, out_dir: str):
    """foreachBatch handler for the stream-static enrich gate,
    IDEMPOTENT under the at-least-once contract (r10 ADVICE: the old
    handler's `tier + 1` increment diverged on a replayed micro-batch).
    Three replay-safe pieces:
     - batch k joins the dimension AT VERSION k (v0 = seed, update j
       commits version j+1), so the join sees exactly the updates of
       batches < k no matter when a retry runs;
     - output lands in a per-batch dir with overwrite;
     - the update applies only while the dim is still at version k (a
       replay after the original update finds k+1 and skips).
    Module-level so tests/test_streaming.py can replay batches against
    it directly."""
    from delta_rs_spark import DeltaTable

    def enrich_batch(batch_df, batch_id: int) -> None:
        dim = DeltaTable(dim_path, spark=spark, version=batch_id).to_df()
        (
            batch_df.join(dim, "user_id", "left")
            .select("event_id", "user_id", "cents", "tier")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch={batch_id}")
        )
        # the upstream dim maintenance this gate simulates: after batch
        # j, a deterministic slice of users moves to the next tier
        dt = DeltaTable(dim_path, spark=spark)
        if dt.version() == batch_id:
            dt.update(
                {"tier": "tier + 1"},
                predicate=f"user_id % 3 = {batch_id % 3}",
            )

    return enrich_batch


@query(
    "q_events_stream_static_enrich",
    """
    WITH raw AS (SELECT event_id, user_id,
                        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
                        CAST(floor(value * 100) AS BIGINT) AS cents
                 FROM events
                 WHERE event_type = 'purchase'),
    bounds AS (SELECT min(sec) AS mn, max(sec) AS mx FROM raw),
    e AS (SELECT r.event_id, r.user_id, r.cents,
                 least(((r.sec - b.mn) * 3) // (b.mx - b.mn + 1), 2) AS arr
          FROM raw r CROSS JOIN bounds b)
    -- the dimension starts at tier 0 for every user; after micro-batch
    -- j the users with user_id % 3 = j are bumped to tier 1, so a
    -- purchase processed in batch k sees tier 1 iff its user's bump
    -- batch precedes k
    SELECT event_id, user_id, cents,
           CASE WHEN user_id % 3 < arr THEN 1 ELSE 0 END AS tier
    FROM e
    """,
)
def q_events_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment with a MID-STREAM dimension update
    (streaming/delta_stream.py + foreachBatch): the purchases stream is
    joined per micro-batch against the CURRENT snapshot of a Delta
    dimension table that an upstream process updates while the stream
    runs — the slowly-changing-dim ingest pattern. The foreachBatch
    handler reloads the dimension snapshot each batch (a plan-time
    static frame would freeze the seed version — the production gotcha
    this gate pins), joins, appends the enriched rows, then applies the
    next scheduled dimension UPDATE through the Delta UPDATE operator,
    so every batch observes exactly the mutations that preceded it.
    The oracle replays the batch assignment and the deterministic
    update schedule in SQL."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from delta_rs_spark import DeltaTable, write_deltalake

    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))).cast("long")
    base = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        sec.alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = base.agg(F.min("sec").alias("mn"), F.max("sec").alias("mx"))
    arr = F.least(
        F.expr("((sec - mn) * 3) div (mx - mn + 1)"), F.lit(2).cast("long")
    )
    staged = base.crossJoin(F.broadcast(bounds)).select(
        "event_id", "user_id", "cents", arr.alias("arr")
    )

    tag = _os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/delta_rs_spark_oracle/{tag}/stream_static_enrich_{_os.getpid()}"
    stream_dir = _stage_batch_files(
        staged, root, "arr", ["event_id", "user_id", "cents"]
    )

    global _ENRICH_GATE_SEQ
    _ENRICH_GATE_SEQ += 1
    seq = _ENRICH_GATE_SEQ
    # the dimension MUTATES during the run -> rebuilt per invocation
    # (only the immutable stream input is cached across invocations)
    dim_path = f"{root}/dim{_os.getpid()}_{seq}"
    out_dir = f"{root}/out{_os.getpid()}_{seq}"
    ckpt = f"{root}/ckpt{seq}"
    for p in (dim_path, out_dir, ckpt):
        _shutil.rmtree(p, ignore_errors=True)
    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("tier", F.lit(0).cast("long"))
    )
    write_deltalake(dim_path, users)
    enrich_batch = _make_enrich_handler(spark, dim_path, out_dir)

    src = spark.readStream.schema(
        "event_id long, user_id long, cents long"
    ).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    q = (
        src.writeStream.foreachBatch(enrich_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select(
        "event_id", "user_id", "cents", "tier"
    )


_DDWW_GATE_SEQ = 0


@query(
    "q_events_dedup_within_watermark",
    """
    WITH raw AS (SELECT event_id, user_id, event_type,
                        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
                 FROM events),
    bounds AS (SELECT min(sec) AS mn, max(sec) AS mx FROM raw),
    e AS (SELECT r.event_id, r.user_id, r.event_type, r.sec,
                 CASE WHEN r.event_id % 50 = 0 THEN 2
                      ELSE least(((r.sec - b.mn) * 3) // (b.mx - b.mn + 1), 2)
                 END AS arr
          FROM raw r CROSS JOIN bounds b),
    -- one row per (key, batch) is staged (min event time, event_id
    -- tiebreak): within-batch first-occurrence order inside the engine
    -- is not deterministic; the cross-batch state rules are what this
    -- gate pins
    staged AS (SELECT * FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type, arr
                   ORDER BY sec, event_id) AS rn FROM e) WHERE rn = 1),
    -- wm1 = the watermark in effect during batch 1 (max event time
    -- through batch 0, minus the 30-min delay). It is BOTH the lagged
    -- late-filter bound of batch 2 (SPARK-24634) and the end-of-batch-1
    -- eviction bound — the two rules share the value by construction
    -- (each lags one batch); the synthetic pytest pins them separately
    wm AS (SELECT max(sec) - 1800 AS wm1 FROM staged WHERE arr = 0),
    emit0 AS (SELECT user_id, event_type, sec, event_id
              FROM staged WHERE arr = 0),
    -- batch 1: no late filter yet (lagged wm undefined); state = emit0
    -- intact (batch 0 ran with no watermark, so nothing was evicted)
    emit1 AS (SELECT s.user_id, s.event_type, s.sec, s.event_id
              FROM staged s WHERE s.arr = 1
               AND NOT EXISTS (SELECT 1 FROM emit0 o
                               WHERE o.user_id = s.user_id
                                 AND o.event_type = s.event_type)),
    -- end of batch 1 evicts state with expiry (= emitted event time +
    -- delay) <= wm1, NON-strict; duplicates never extended the expiry
    s1 AS (SELECT u.user_id, u.event_type
           FROM (SELECT user_id, event_type, sec FROM emit0
                 UNION ALL SELECT user_id, event_type, sec FROM emit1) u, wm
           WHERE u.sec + 1800 > wm.wm1),
    -- batch 2: late filter vs the LAGGED watermark (<= drops), then
    -- dedup vs surviving state; an evicted key RE-EMITS
    emit2 AS (SELECT s.user_id, s.event_type, s.sec, s.event_id
              FROM staged s, wm
              WHERE s.arr = 2 AND s.sec > wm.wm1
               AND NOT EXISTS (SELECT 1 FROM s1
                               WHERE s1.user_id = s.user_id
                                 AND s1.event_type = s.event_type))
    SELECT user_id, event_type, sec, event_id FROM emit0
    UNION ALL SELECT user_id, event_type, sec, event_id FROM emit1
    UNION ALL SELECT user_id, event_type, sec, event_id FROM emit2
    """,
)
def q_events_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup under a REAL late-data stream
    (streaming/stateful.py dedup_within_watermark, the engine's
    dropDuplicatesWithinWatermark): idempotency-style dedup of the
    event stream by (user_id, event_type) with 30 minutes of event-time
    state TTL — the alert-throttling / retry-storm shape where
    unbounded key state (dedup_stream) is the wrong cost model. Same
    staged arrival as the other stream gates (three time-chunks, every
    50th event displaced two batches late, mtime-pinned, availableNow),
    pre-deduped to one min-time row per (key, batch) so within-batch
    arrival order — which the engine does not define — never decides
    the output. Pins every probed state rule at corpus scale: late
    rows dropped against the LAGGED watermark (non-strict); duplicates
    dropped against live state without extending its expiry; eviction
    at end-of-batch with the CURRENT watermark (non-strict on expiry);
    evicted keys re-emitting on re-arrival (the dominant branch here:
    a 30-day event range advances the watermark ~10 days per batch).
    The oracle unrolls the 3-batch replay in SQL."""
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from delta_rs_spark.streaming.stateful import dedup_within_watermark

    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))).cast("long")
    base = ev.select("event_id", "user_id", "event_type", sec.alias("sec"))
    bounds = base.agg(F.min("sec").alias("mn"), F.max("sec").alias("mx"))
    arr = F.when(F.col("event_id") % 50 == 0, F.lit(2).cast("long")).otherwise(
        F.least(F.expr("((sec - mn) * 3) div (mx - mn + 1)"), F.lit(2).cast("long"))
    )
    w = Window.partitionBy("user_id", "event_type", "arr").orderBy("sec", "event_id")
    staged = (
        base.crossJoin(F.broadcast(bounds))
        .select("event_id", "user_id", "event_type", "sec", arr.alias("arr"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.timestamp_seconds(F.col("sec")).alias("ts_ts"),
            "user_id",
            "event_type",
            "event_id",
            "arr",
        )
    )

    tag = _os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/delta_rs_spark_oracle/{tag}/dedup_within_watermark_{_os.getpid()}"
    stream_dir = _stage_batch_files(
        staged, root, "arr", ["ts_ts", "user_id", "event_type", "event_id"]
    )
    src = spark.readStream.schema(
        "ts_ts timestamp, user_id long, event_type string, event_id long"
    ).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    out = dedup_within_watermark(
        src, keys=["user_id", "event_type"], ts_col="ts_ts", delay="30 minutes"
    ).select(
        "user_id",
        "event_type",
        F.col("ts_ts").cast("long").alias("sec"),
        "event_id",
    )
    global _DDWW_GATE_SEQ
    _DDWW_GATE_SEQ += 1
    return _run_gate_stream(
        spark, out, "dedup_within_watermark_gate", root, _DDWW_GATE_SEQ
    )
