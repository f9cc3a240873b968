"""CONVERT TO DELTA — in-place convert a parquet directory.

(reference: crates/core/src/operations/convert_to_delta.rs; python
surface python/deltalake/writer/convert_to.py:24-83)

Generates Add actions (with footer stats) for every existing parquet
file — Hive-partitioned (``k=v`` dirs) or flat — and commits
protocol+metadata without rewriting any data.
"""

from __future__ import annotations

import json
import os
import urllib.parse

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from delta_rs_spark.log import commit as commit_mod
from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.actions import Add, CommitInfo, Metadata, Protocol
from delta_rs_spark.log.commit import DeltaError, TransactionInfo
from delta_rs_spark.log.stats import collect_stats_parallel, stats_json
from delta_rs_spark.operators.util import local_table_path

_NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def convert_to_deltalake(
    uri: str,
    spark: SparkSession | None = None,
    mode: str = "error",
    partition_by: T.StructType | list[str] | None = None,
    partition_strategy: str | None = None,
    name: str | None = None,
    description: str | None = None,
    configuration: dict[str, str] | None = None,
    storage_options: dict[str, str] | None = None,
    commit_properties=None,
    post_commithook_properties=None,
) -> None:
    """(reference: python/deltalake/writer/convert_to.py:23-33 — 'hive'
    is the only partition strategy there too; mode='ignore' no-ops on an
    existing Delta table instead of erroring.)"""
    if partition_strategy not in (None, "hive"):
        raise ValueError(f"unsupported partition strategy {partition_strategy!r}")
    if mode not in ("error", "ignore"):
        raise ValueError(f"invalid convert mode {mode!r}")
    path = local_table_path(uri)
    if snap_mod.is_delta_table(path):
        if mode == "ignore":
            return
        raise DeltaError(f"already a Delta table: {path}")
    if spark is None:
        from delta_rs_spark.session import get_spark

        spark = get_spark()

    files: list[tuple[str, str, dict[str, str | None]]] = []  # abs, rel, partvals
    for root, dirs, fnames in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fn in fnames:
            if not fn.endswith(".parquet") or fn.startswith(("_", ".")):
                continue
            absf = os.path.join(root, fn)
            rel = os.path.relpath(absf, path).replace(os.sep, "/")
            part_vals: dict[str, str | None] = {}
            for seg in rel.split("/")[:-1]:
                k, _, v = seg.partition("=")
                part_vals[k] = None if v == _NULL_PARTITION else urllib.parse.unquote(v)
            files.append((absf, rel, part_vals))
    if not files:
        raise DeltaError(f"no parquet files under {path}")

    part_col_names = list(files[0][2].keys())
    if isinstance(partition_by, T.StructType):
        part_schema: T.StructType | None = partition_by
        expected = [f.name for f in partition_by.fields]
        if expected != part_col_names:
            raise DeltaError(f"partition_by {expected} != discovered {part_col_names}")
    else:
        part_schema = None
        if partition_by and list(partition_by) != part_col_names:
            raise DeltaError(f"partition_by {partition_by} != discovered {part_col_names}")

    # schema: data columns from parquet + partition columns (string unless given)
    data_schema = spark.read.parquet(files[0][0]).schema
    fields = list(data_schema.fields)
    for pc in part_col_names:
        dtype: T.DataType = T.StringType()
        if part_schema is not None:
            dtype = part_schema[pc].dataType
        fields.append(T.StructField(pc, dtype, True))
    schema = T.StructType(fields)

    stats = collect_stats_parallel([f[0] for f in files])
    adds = [
        Add(
            path=rel,
            size=os.path.getsize(absf),
            modification_time=int(os.path.getmtime(absf) * 1000),
            data_change=True,
            partition_values=part_vals,
            # st is None when pyarrow cannot read the footer (e.g. a
            # foreign file with the VARIANT logical type): convert
            # without stats rather than fail
            stats=stats_json(st) if st is not None else None,
        )
        for (absf, rel, part_vals), st in zip(files, stats)
    ]
    from delta_rs_spark.features import required_protocol

    actions: list = [
        required_protocol(schema.json(), configuration),
        Metadata(
            schema_string=schema.json(),
            partition_columns=part_col_names,
            configuration=configuration or {},
            name=name,
            description=description,
        ),
        *adds,
    ]
    op = CommitInfo(
        "CONVERT",
        {"numFiles": len(adds), "partitionedBy": part_col_names},
        operation_metrics={"numConvertedFiles": len(adds)},
    )
    commit_mod.commit(path, actions, op, -1, TransactionInfo(blind_append=False, read_whole_table=True))
