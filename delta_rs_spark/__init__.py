"""delta_rs_spark — a PySpark-native engine with the query and
data-processing capabilities of delta-io/delta-rs.

Spark is the data plane (DataFrame/SQL/Catalyst/Structured Streaming);
a pure-Python Delta-protocol transaction log is the control plane
(this container has no delta-spark jars, so the log layer —
actions/snapshots/OCC/checkpoints per the public Delta protocol — is
implemented here and Parquet data files are read/written by Spark).
"""

__version__ = "0.3.0"  # round-numbered engine version (not the reference's)

from delta_rs_spark.session import get_spark
from delta_rs_spark.table import DeltaTable
from delta_rs_spark.writer import write_deltalake
from delta_rs_spark.query import QueryBuilder
from delta_rs_spark.features import TableFeatures
from delta_rs_spark.log.actions import Metadata
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

__all__ = [
    "get_spark",
    "DeltaTable",
    "write_deltalake",
    "QueryBuilder",
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
]
__version__ = "0.1.0"
