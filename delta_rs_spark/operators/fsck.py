"""FSCK / repair — drop add-actions whose files are missing on storage.

(reference: crates/core/src/operations/filesystem_check.rs; python
surface python/deltalake/table.py:1265-1316 ``dt.repair``)
"""

from __future__ import annotations

import os
from typing import Any

from delta_rs_spark.log import commit as commit_mod
from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.actions import CommitInfo, Remove, now_ms
from delta_rs_spark.log.commit import TransactionInfo


def repair(table_path: str, dry_run: bool = False) -> dict[str, Any]:
    snapshot = snap_mod.load_snapshot(table_path)
    ts = now_ms()
    missing = [
        add
        for add in snapshot.files.values()
        if not os.path.exists(os.path.join(table_path, add.path))
    ]
    result = {
        "dry_run": dry_run,
        "files_removed": [a.path for a in missing],
    }
    if dry_run or not missing:
        return result
    removes = [Remove(a.path, ts, True, a.partition_values, a.size) for a in missing]
    op = CommitInfo(
        "FSCK",
        {"dryRun": dry_run},
        operation_metrics={"numRemovedFiles": len(removes)},
    )
    commit_mod.commit(
        table_path,
        removes,
        op,
        snapshot.version,
        TransactionInfo(blind_append=False, read_whole_table=True),
    )
    return result
