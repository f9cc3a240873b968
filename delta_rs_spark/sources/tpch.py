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

# --- load-time schema guard -------------------------------------------------
# The driver has regenerated testdata once already (events.ts flipped
# TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) between rounds); a silent dtype or
# column change in any OTHER table would surface as dozens of baffling
# oracle mismatches instead of one clear error. So every load asserts the
# parquet footer against the pinned layout below, comparing COARSE type
# classes — exact physical widths (int32 vs int64) and timestamp units are
# allowed to drift because every query reads these semantically.
_EXPECTED_FOOTERS: dict[str, tuple[tuple[str, str], ...]] = {
    "region": (("r_regionkey", "int"), ("r_name", "string")),
    "nation": (("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")),
    "customer": (
        ("c_custkey", "int"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "float"),
        ("c_mktsegment", "string"),
    ),
    "supplier": (
        ("s_suppkey", "int"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "float"),
    ),
    "part": (
        ("p_partkey", "int"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "float"),
    ),
    "orders": (
        ("o_orderkey", "int"),
        ("o_custkey", "int"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "float"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ),
    "lineitem": (
        ("l_orderkey", "int"),
        ("l_partkey", "int"),
        ("l_suppkey", "int"),
        ("l_linenumber", "int"),
        ("l_quantity", "float"),
        ("l_extendedprice", "float"),
        ("l_discount", "float"),
        ("l_tax", "float"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ),
    "events": (
        ("event_id", "int"),
        # ts has shipped as timestamp[us], timestamp[ns], and could ship
        # as raw epoch int64 — all three load paths exist, so any of the
        # three classes is acceptable here.
        ("ts", "timestamp|int"),
        ("user_id", "int"),
        ("event_type", "string"),
        ("value", "float"),
        ("props", "string"),
    ),
    "documents": (
        ("doc_id", "int"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int"),
    ),
    "embeddings": (
        ("vec_id", "int"),
        ("embedding", "list<float>"),
        ("label", "int"),
    ),
}


def _type_class(t) -> str:
    """Coarse class of a pyarrow type: int/float/string/timestamp/date/
    list<float>/... — widths and units collapse, semantic kind doesn't."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_type_class(t.value_type)}>"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


_checked_footers: set[str] = set()


def _assert_footer(name: str, path: str) -> None:
    """Fail loudly (with the observed footer) if a table's parquet layout
    drifted from the pinned TESTDATA.md contract. Runs once per file path
    per process — a single footer read, no data scan."""
    expected = _EXPECTED_FOOTERS.get(name)
    if expected is None or path in _checked_footers:
        return
    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        parts = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
        p = os.path.join(p, parts[0])
    schema = pq.ParquetFile(p).schema_arrow
    observed = [(f.name, _type_class(f.type)) for f in schema]
    problems = []
    exp_cols = {c: k for c, k in expected}
    obs_cols = dict(observed)
    for col, kinds in exp_cols.items():
        if col not in obs_cols:
            problems.append(f"missing column {col!r} (expected {kinds})")
        elif obs_cols[col] not in kinds.split("|"):
            problems.append(
                f"column {col!r} is {obs_cols[col]} (expected {kinds})"
            )
    for col in obs_cols:
        if col not in exp_cols:
            problems.append(f"unexpected new column {col!r} ({obs_cols[col]})")
    if problems:
        raise RuntimeError(
            f"testdata schema drift in {path}: " + "; ".join(problems) + ". "
            f"Observed footer: {observed}. The driver regenerated testdata "
            "with a new layout — update _EXPECTED_FOOTERS in "
            "delta_rs_spark/sources/tpch.py and audit loaders/queries that "
            "touch the changed columns (see the events.ts precedent at "
            "load_table)."
        )
    _checked_footers.add(path)



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
    _assert_footer(name, path)
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
    _assert_footer("events", path)
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
