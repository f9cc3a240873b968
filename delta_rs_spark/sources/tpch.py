"""Loaders for the driver's synthetic TPC-H-ish tables.

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir
(TESTDATA.md). All loads are plain `spark.read.parquet` so Catalyst gets
predicate pushdown / column pruning for free (vectorized reader intact).

The only special case is `events.ts`: the driver has shipped it both as
parquet TIMESTAMP(MICROS) (current) and TIMESTAMP(NANOS) (round 1-2).
Spark 4 reads µs natively but refuses ns, so we branch on the parquet
footer's unit instead of assuming one. Whatever the physical type, the
loaded frame guarantees `ts` is a µs-precision TimestampType column
(session TZ is pinned UTC, so arithmetic matches DuckDB's naive-UTC) and
`ts_ts` is an alias of it kept for the window-operator API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fallback read schema for the TIMESTAMP(NANOS) layout Spark 4 can't read
# natively: force ts to int64 epoch-nanos, convert below.
_EVENTS_NS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch nanoseconds
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_ts_unit(path: str) -> str | None:
    """Timestamp unit ('us'/'ns'/'ms'/'s') of events.ts per the parquet
    footer, or None when the column is stored as plain int64."""
    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        parts = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
        p = os.path.join(p, parts[0])
    return getattr(pq.ParquetFile(p).schema_arrow.field("ts").type, "unit", None)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Guarantee `ts` is TimestampType (µs) and `ts_ts` aliases it."""
    t = df.schema["ts"].dataType
    if isinstance(t, T.LongType):
        # raw int64: epoch-µs by convention (ns is handled pre-read)
        df = df.withColumn("ts", F.timestamp_micros("ts"))
    elif not isinstance(t, T.TimestampType):
        # TimestampNTZ from the native µs read: identity cast under UTC
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df.withColumn("ts_ts", F.col("ts"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if _events_ts_unit(path) == "ns":
            df = spark.read.schema(_EVENTS_NS_SCHEMA).parquet(path)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = spark.read.parquet(path)
        return _normalize_ts(df)
    return spark.read.parquet(path)


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``load_table(..., 'events')`` — same ts contract.
    Uses the file's own footer schema so the vectorized reader stays on."""
    path = os.path.join(sf_dir, "events.parquet")
    if _events_ts_unit(path) == "ns":
        schema = _EVENTS_NS_SCHEMA
        post = lambda df: df.withColumn(  # noqa: E731
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        schema = spark.read.parquet(path).schema
        post = lambda df: df  # noqa: E731
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_ts(post(stream))


def load_all(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
