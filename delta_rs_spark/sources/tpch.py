"""Loaders for the driver's synthetic TPC-H-ish tables.

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir
(TESTDATA.md). All loads are plain `spark.read.parquet` so Catalyst gets
predicate pushdown / column pruning for free; the only special case is
`events`, whose `ts` column is TIMESTAMP(NANOS) parquet, which Spark 4
refuses to read natively — we read it as epoch-nanos LongType via an
explicit schema (session-conf independent) and expose a derived
timestamp-µs column.
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

_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch nanoseconds (parquet TIMESTAMP(NANOS))
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = spark.read.schema(_EVENTS_SCHEMA).parquet(path)
        # ts_ts: µs-precision timestamp for window/date functions (session TZ
        # is pinned to UTC so this matches DuckDB's naive-UTC arithmetic).
        return df.withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
