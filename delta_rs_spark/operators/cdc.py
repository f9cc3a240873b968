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
    """Write rows (must already carry _change_type) under _change_data/."""
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
