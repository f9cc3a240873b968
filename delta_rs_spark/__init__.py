"""delta_rs_spark — a PySpark-native engine with the query and
data-processing capabilities of delta-io/delta-rs.

Spark is the data plane (DataFrame/SQL/Catalyst/Structured Streaming);
a pure-Python Delta-protocol transaction log is the control plane
(this container has no delta-spark jars, so the log layer —
actions/snapshots/OCC/checkpoints per the public Delta protocol — is
implemented here and Parquet data files are read/written by Spark).
"""

__version__ = "0.4.0"  # round-numbered engine version (not the reference's)

from delta_rs_spark.session import get_spark
from delta_rs_spark.table import DeltaTable
from delta_rs_spark.writer import write_deltalake
from delta_rs_spark.query import QueryBuilder
from delta_rs_spark.features import TableFeatures
from delta_rs_spark.log.actions import Metadata
from delta_rs_spark.operators.clone import clone_table
from delta_rs_spark.operators.convert import convert_to_deltalake
from delta_rs_spark.schema import (
    ArrayType,
    DataType,
    Field,
    MapType,
    PrimitiveType,
    Schema,
    StructType,
    VariantType,
)
from delta_rs_spark.properties import (
    BloomFilterProperties,
    ColumnProperties,
    CommitProperties,
    PostCommitHookProperties,
    Transaction,
    WriterProperties,
)
from delta_rs_spark.log.commit import (
    CommitFailedError,
    ConcurrentAppendError,
    ConcurrentDeleteDeleteError,
    ConcurrentDeleteReadError,
    ConcurrentTransactionError,
    DeltaError,
    MetadataChangedError,
    ProtocolChangedError,
)

def rust_core_version() -> str:
    """Version of the underlying execution core.

    The reference exposes its Rust crate version here
    (``python/deltalake/__init__.py`` re-exporting
    ``_internal.rust_core_version``). This engine's execution core is
    Apache Spark, so the honest analogue is the PySpark version string,
    prefixed so callers can tell which engine they are on.
    """
    import pyspark

    return f"pyspark-{pyspark.__version__}"


# Mirrors the reference's process-wide nanosecond-timestamp toggle
# (python/deltalake/__init__.py:85-130). Spark SQL's TimestampType is
# microsecond precision, so nanosecond write support cannot be enabled;
# the READ path already falls back ns->us (sources/tpch.py) the same way
# the reference's default build casts nanos to micros.
_NANOSECOND_TIMESTAMPS: bool = False


def enable_nanosecond_timestamps() -> None:
    """Enable experimental nanosecond timestamp primitives (unsupported).

    The reference raises ``RuntimeError`` when its extension was not
    compiled with the nanosecond-timestamps feature
    (python/deltalake/__init__.py:99-102); this engine is in the same
    position permanently — Spark's TimestampType is microsecond
    precision — so the same error contract applies. Nanosecond parquet
    columns are still readable: they are cast to microseconds on load.
    """
    raise RuntimeError(
        "Engine core (Spark SQL) has microsecond timestamp precision; "
        "nanosecond timestamp primitives cannot be enabled. Nanosecond "
        "parquet columns are read with a cast to microseconds."
    )


def _nanosecond_timestamps_enabled() -> bool:
    """Return whether nanosecond timestamps are enabled (always False)."""
    return _NANOSECOND_TIMESTAMPS


def init_tracing(endpoint: "str | None" = None) -> None:
    """Initialize tracing for engine operations (no-op stub).

    The reference wires an OpenTelemetry OTLP exporter into its Rust
    core (python/deltalake/__init__.py:33-81). Spark's operational
    telemetry lives in the Spark UI / event log instead; there is no
    OTLP exporter in this environment, so this accepts the same
    signature and does nothing. The endpoint argument is validated for
    type to fail as early as the reference would.
    """
    if endpoint is not None and not isinstance(endpoint, str):
        raise TypeError(f"endpoint must be a str or None, got {type(endpoint)!r}")


__all__ = [
    "get_spark",
    "DeltaTable",
    "write_deltalake",
    "QueryBuilder",
    "clone_table",
    "convert_to_deltalake",
    "BloomFilterProperties",
    "ColumnProperties",
    "CommitProperties",
    "PostCommitHookProperties",
    "WriterProperties",
    "Schema",
    "Field",
    "PrimitiveType",
    "ArrayType",
    "DataType",
    "MapType",
    "StructType",
    "VariantType",
    "TableFeatures",
    "Transaction",
    "Metadata",
    "__version__",
    "DeltaError",
    "CommitFailedError",
    "ConcurrentAppendError",
    "ConcurrentDeleteReadError",
    "ConcurrentDeleteDeleteError",
    "ConcurrentTransactionError",
    "MetadataChangedError",
    "ProtocolChangedError",
    "enable_nanosecond_timestamps",
    "init_tracing",
    "rust_core_version",
]
