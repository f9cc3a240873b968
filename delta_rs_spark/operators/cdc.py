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
    column mapping); load_cdf renames back."""
    from delta_rs_spark.plans import column_mapping as cmap

    try:
        from delta_rs_spark.log import snapshot as snap_mod

        cfg = snap_mod.load_snapshot(table_path).configuration
        if cmap.mapping_mode(cfg) != "none":
            import json as _json

            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(
                _json.loads(snap_mod.load_snapshot(table_path).schema_string)
            )
            # rename the table columns, carry _change_type through as-is
            cols = []
            for f in schema.fields:
                c = F.col(f"`{f.name}`")
                pt = cmap._physical_type(f.dataType)
                if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
                    c = c.cast(pt)
                cols.append(c.alias(cmap._physical_name(f)))
            change_df = change_df.select(*cols, F.col(CHANGE_TYPE_COL))
    except Exception:
        pass
    stage = os.path.join(table_path, f"_staging_cdc_{uuid.uuid4().hex}")
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
            dst = os.path.join(out_dir, f"cdc-{uuid.uuid4().hex}.snappy.parquet")
            os.rename(src, dst)
            rel = os.path.relpath(dst, table_path).replace(os.sep, "/")
            actions.append(AddCDCFile(path=rel, size=os.path.getsize(dst)))
    shutil.rmtree(stage, ignore_errors=True)
    return actions
