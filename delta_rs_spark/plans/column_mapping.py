"""Column mapping mode (``delta.columnMapping.mode`` = name | id).

Foreign writers with column mapping enabled store PHYSICAL column names
(``col-<uuid>``) in the parquet files and in Add.partitionValues /
Add.stats, while the logical names live only in the schema's field
metadata (``delta.columnMapping.physicalName`` /
``delta.columnMapping.id``) — reference:
crates/core/src/table/config.rs:127-186 and the Delta protocol's
"Column Mapping" section. Without this translation such tables are
unreadable (or worse, silently all-null).

Read strategy: scan parquet with the PHYSICAL schema, then rename back
to logical via positional struct casts (covers nested fields). ``id``
mode tables always carry physicalName metadata too, so name-based
matching serves both modes — Spark's parquet reader matches by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PHYSICAL_NAME_KEY = "delta.columnMapping.physicalName"
COLUMN_ID_KEY = "delta.columnMapping.id"
MODE_KEY = "delta.columnMapping.mode"


def mapping_mode(configuration: dict[str, str]) -> str:
    return (configuration or {}).get(MODE_KEY, "none")


def ensure_writable(configuration: dict[str, str]) -> None:
    """Mutations would have to write physical-named parquet + mapped
    stats to stay protocol-correct; until the write path does that,
    refuse loudly rather than corrupt a foreign table."""
    if mapping_mode(configuration) != "none":
        from delta_rs_spark.log.commit import DeltaError

        raise DeltaError(
            "column-mapped tables (delta.columnMapping.mode != none) are "
            "read-only in this engine"
        )


def _physical_name(field: T.StructField) -> str:
    return (field.metadata or {}).get(PHYSICAL_NAME_KEY, field.name)


def _physical_type(dtype: T.DataType) -> T.DataType:
    if isinstance(dtype, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    _physical_name(f), _physical_type(f.dataType), f.nullable
                )
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return T.ArrayType(_physical_type(dtype.elementType), dtype.containsNull)
    if isinstance(dtype, T.MapType):
        return T.MapType(
            _physical_type(dtype.keyType),
            _physical_type(dtype.valueType),
            dtype.valueContainsNull,
        )
    return dtype


def physical_schema(schema: T.StructType) -> T.StructType:
    """Logical table schema -> schema with physical names at every level."""
    return _physical_type(schema)


def logical_to_physical(schema: T.StructType) -> dict[str, str]:
    """Top-level logical -> physical name map (what partitionValues,
    stats, and file-skipping lookups are keyed by)."""
    return {f.name: _physical_name(f) for f in schema.fields}


def rename_to_logical(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Physical-name DataFrame -> logical names, nested fields included
    (positional struct cast renames interior fields for free)."""
    cols = []
    for f in schema.fields:
        phys = _physical_name(f)
        c = F.col(f"`{phys}`")
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            c = c.cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)
