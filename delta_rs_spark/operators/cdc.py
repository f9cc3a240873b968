"""Change-data-file writer shared by DELETE/UPDATE/MERGE/WRITE.

Mirrors the reference's CDC tracker (reference:
crates/core/src/operations/cdc.rs:14-51): when
``delta.enableChangeDataFeed=true``, mutation operators persist the
changed rows (with a ``_change_type`` column) as parquet under
``_change_data/`` and commit AddCDCFile actions alongside the data
actions. Readers synthesize insert/delete rows for plain append /
overwrite commits (see operators/cdf.py).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

from delta_rs_spark.log.actions import AddCDCFile
from delta_rs_spark.log.snapshot import Snapshot

CHANGE_TYPE_COL = "_change_type"
CDC_DIR = "_change_data"


def cdf_enabled(snapshot: Snapshot) -> bool:
    return (
        snapshot.configuration.get("delta.enableChangeDataFeed", "false").lower()
        == "true"
    )


def write_change_data(change_df: DataFrame, table_path: str) -> list[AddCDCFile]:
    """Write rows (must already carry _change_type) under _change_data/.
    On column-mapped tables CDC files carry PHYSICAL column names like
    the data files (Delta protocol: change data follows the table's
    column mapping); load_cdf renames back.

    On PARTITIONED tables the stage write splits by DUPLICATED partition
    key columns — the real columns stay inside the files (readers stay
    self-contained, no directory decoding on read) while the per-file
    partitionValues land on the AddCDCFile action, which is what lets
    load_cdf prune change files by a partition predicate (reference
    load_cdf.rs:357-359 prunes change_files the same way)."""
    from pyspark.sql import functions as F

    from delta_rs_spark.plans import column_mapping as cmap

    from delta_rs_spark.log import snapshot as snap_mod
    from delta_rs_spark.plans.row_tracking import materialized_names

    try:
        snap = snap_mod.load_snapshot(table_path)
    except Exception:
        snap = None

    # row tracking's hidden materialized columns ride rewrite frames;
    # CDC files carry TABLE columns only (change consumers never see
    # physical row ids). The names come from the table CONFIGURATION
    # (delta.rowTracking.materialized*ColumnName) — a foreign writer may
    # not follow our '_row-id-col-' prefix convention.
    hidden = [
        c
        for c in change_df.columns
        if c in materialized_names(snap.configuration if snap else None)
    ]
    if hidden:
        change_df = change_df.drop(*hidden)

    part_phys: list[str] = []
    try:
        if snap is None:
            raise ValueError("no snapshot")
        mapped = cmap.mapping_mode(snap.configuration) != "none"
        if mapped:
            import json as _json

            from pyspark.sql import types as T

            schema = T.StructType.fromJson(_json.loads(snap.schema_string))
            # rename the table columns, carry _change_type through as-is
            cols = []
            for f in schema.fields:
                c = F.col(f"`{f.name}`")
                pt = cmap._physical_type(f.dataType)
                if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
                    c = c.cast(pt)
                cols.append(c.alias(cmap._physical_name(f)))
            change_df = change_df.select(*cols, F.col(CHANGE_TYPE_COL))
            phys = cmap.logical_to_physical(schema)
            part_phys = [phys.get(c, c) for c in snap.partition_columns]
        else:
            part_phys = list(snap.partition_columns)
    except Exception:
        part_phys = []
    stage = os.path.join(table_path, f"_staging_cdc_{uuid.uuid4().hex}")
    stage_keys: list[str] = []
    if part_phys and all(p in change_df.columns for p in part_phys):
        for i, p in enumerate(part_phys):
            change_df = change_df.withColumn(f"__cdc_p_{i}", F.col(f"`{p}`"))
        stage_keys = [f"__cdc_p_{i}" for i in range(len(part_phys))]
        change_df.write.mode("overwrite").partitionBy(*stage_keys).parquet(stage)
    else:
        part_phys = []
        change_df.write.mode("overwrite").parquet(stage)
    out_dir = os.path.join(table_path, CDC_DIR)
    os.makedirs(out_dir, exist_ok=True)
    actions: list[AddCDCFile] = []
    for root, _dirs, files in os.walk(stage):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            src = os.path.join(root, fn)
            if os.path.getsize(src) == 0:
                continue
            part_vals: dict[str, str | None] = {}
            rel_dir = os.path.relpath(root, stage)
            dst_dir = out_dir
            if part_phys and rel_dir != ".":
                from delta_rs_spark.writer import (
                    _decode_partition_dir,
                    _encode_partition_value,
                )

                for seg in rel_dir.split(os.sep):
                    k, v = _decode_partition_dir(seg)
                    part_vals[part_phys[int(k.rsplit("_", 1)[1])]] = v
                # delta-spark's CDC layout: nested partition dirs under
                # _change_data/ with the REAL column names
                dst_dir = os.path.join(
                    out_dir,
                    *[
                        f"{c}={_encode_partition_value(v)}"
                        for c, v in part_vals.items()
                    ],
                )
                os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, f"cdc-{uuid.uuid4().hex}.snappy.parquet")
            os.rename(src, dst)
            rel = os.path.relpath(dst, table_path).replace(os.sep, "/")
            actions.append(
                AddCDCFile(
                    path=rel, size=os.path.getsize(dst), partition_values=part_vals
                )
            )
    shutil.rmtree(stage, ignore_errors=True)
    return actions
