"""Row tracking (Delta PROTOCOL.md "Row Tracking"; reference model:
kernel actions.rs Add.base_row_id/default_row_commit_version).

Every add action on a row-tracking table carries ``baseRowId`` (fresh
row id of row i = baseRowId + i) and ``defaultRowCommitVersion``;
uniqueness comes from the table-wide high watermark stored in the
``delta.rowTracking`` domainMetadata (configuration JSON
``{"rowIdHighWaterMark": N}``), bumped atomically in the same commit
that allocates past it. STABLE ids survive rewrites through the two
materialized columns named by the table configuration
(``delta.rowTracking.materializedRowId/RowCommitVersionColumnName``):
a rewrite carries each surviving row's current id/version into those
hidden parquet columns (they are NOT part of the table schema), and a
reader computes

    row_id             = coalesce(materialized_id,  baseRowId + row_index)
    row_commit_version = coalesce(materialized_ver, defaultRowCommitVersion)

Scale notes: allocation is O(adds) arithmetic on numRecords stats in
the commit path (no data IO, no snapshot rescan on the happy path — the
caller's snapshot supplies the watermark; OCC retries advance it from
the winning commits already being replayed for conflict checks).
Materialization costs one long column per rewrite output file — only
files a rewrite touches anyway."""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F

if TYPE_CHECKING:
    from delta_rs_spark.log.actions import Add
    from delta_rs_spark.log.snapshot import Snapshot

DOMAIN = "delta.rowTracking"
ENABLE_KEY = "delta.enableRowTracking"
MAT_ID_KEY = "delta.rowTracking.materializedRowIdColumnName"
MAT_VER_KEY = "delta.rowTracking.materializedRowCommitVersionColumnName"

ROW_ID_COL = "_row_id"
ROW_VER_COL = "_row_commit_version"


def enabled(configuration: dict | None) -> bool:
    return (configuration or {}).get(ENABLE_KEY, "").lower() == "true"


def materialized_names(configuration: dict | None) -> tuple[str, str]:
    cfg = configuration or {}
    return (
        cfg.get(MAT_ID_KEY, "_row-id-col-unnamed"),
        cfg.get(MAT_VER_KEY, "_row-commit-version-col-unnamed"),
    )


def prepare_create(configuration: dict | None) -> dict | None:
    """Create-time enablement: when delta.enableRowTracking=true, assign
    the two materialized column names (uuid-suffixed per the delta-spark
    convention so they can never collide with user columns; frozen in
    the table configuration for its whole life)."""
    if not enabled(configuration):
        return configuration
    import uuid

    cfg = dict(configuration or {})
    cfg.setdefault(MAT_ID_KEY, f"_row-id-col-{uuid.uuid4()}")
    cfg.setdefault(MAT_VER_KEY, f"_row-commit-version-col-{uuid.uuid4()}")
    return cfg


def high_watermark(snapshot: "Snapshot") -> int:
    """Current rowIdHighWaterMark (-1 when never allocated). Guards
    against regression by also covering the live adds: a restore that
    reinstated an older domain value must never cause id reuse."""
    wm = -1
    dm = snapshot.domain_metadata.get(DOMAIN)
    if dm is not None:
        try:
            wm = int(json.loads(dm.configuration).get("rowIdHighWaterMark", -1))
        except (ValueError, TypeError):
            wm = -1
    for a in snapshot.files.values():
        if a.base_row_id is not None:
            n = a.num_records() or 0
            wm = max(wm, a.base_row_id + max(n - 1, 0))
    return wm


def cached_watermark(snapshot) -> int | None:
    """Watermark for TransactionInfo.rt_watermark: operators that hold
    the read snapshot pass this so commit() never replays the log just
    to find the allocation base. None when row tracking is off (commit
    skips allocation entirely)."""
    if not enabled(snapshot.configuration):
        return None
    return high_watermark(snapshot)


def watermark_action(watermark: int):
    from delta_rs_spark.log.actions import DomainMetadata

    return DomainMetadata(
        DOMAIN, json.dumps({"rowIdHighWaterMark": int(watermark)}), False
    )


def assign_base_row_ids(
    actions: list, watermark: int, commit_version: int
) -> tuple[list, int]:
    """Fresh copies of ``actions`` with every data Add allocated a
    baseRowId range above ``watermark`` (in action order) and stamped
    with ``commit_version``; appends the bumped-watermark domain action
    when anything was allocated. Adds that already carry a baseRowId
    (e.g. RESTORE re-adding historical files, clone-copied actions)
    keep it — their range is already below the watermark.

    Returns (new_actions, new_watermark). Raises when an Add lacks
    numRecords stats — allocation needs the row count."""
    import dataclasses

    from delta_rs_spark.log.actions import Add, DomainMetadata
    from delta_rs_spark.log.commit import DeltaError

    out = []
    wm = watermark
    allocated = False
    for a in actions:
        if isinstance(a, Add) and a.base_row_id is None:
            n = a.num_records()
            if n is None:
                raise DeltaError(
                    f"row tracking requires numRecords stats on every add "
                    f"(missing on {a.path})"
                )
            a = dataclasses.replace(
                a,
                base_row_id=wm + 1,
                default_row_commit_version=commit_version,
            )
            wm += max(int(n), 1)  # empty files still claim one id: bases stay unique
            allocated = True
        elif isinstance(a, Add) and a.default_row_commit_version is None:
            a = dataclasses.replace(a, default_row_commit_version=commit_version)
        out.append(a)
    if allocated:
        # ours supersedes any caller-provided copy (stale watermark must
        # not win the replay — DomainMetadata is latest-wins)
        out = [
            a
            for a in out
            if not (isinstance(a, DomainMetadata) and a.domain == DOMAIN)
        ]
        out.append(watermark_action(wm))
    return out, wm


def advance_watermark_from(winning: list, watermark: int) -> int:
    """Largest watermark implied by a winning commit's actions — OCC
    retries re-allocate above what the winners claimed."""
    from delta_rs_spark.log.actions import Add, DomainMetadata

    wm = watermark
    for a in winning:
        if isinstance(a, DomainMetadata) and a.domain == DOMAIN and not a.removed:
            try:
                wm = max(wm, int(json.loads(a.configuration)["rowIdHighWaterMark"]))
            except (ValueError, KeyError, TypeError):
                pass
        elif isinstance(a, Add) and a.base_row_id is not None:
            n = a.num_records() or 1
            wm = max(wm, a.base_row_id + n - 1)
    return wm


def file_map_df(spark, adds: list["Add"], table_path: str) -> DataFrame:
    """(absolute path, baseRowId, defaultRowCommitVersion) per add —
    metadata-sized, broadcast into the scan join."""
    from delta_rs_spark.operators.util import resolve_add_path

    rows = [
        (
            resolve_add_path(table_path, a.path),
            a.base_row_id,
            a.default_row_commit_version,
        )
        for a in adds
    ]
    return spark.createDataFrame(
        rows, "__rt_fp string, __rt_base long, __rt_ver long"
    )


def with_row_ids(
    df: DataFrame,
    spark,
    snapshot: "Snapshot",
    table_path: str,
    adds: list["Add"] | None = None,
    fp_col: str = "__rt_file",
    ri_col: str = "__rt_index",
    id_col: str = ROW_ID_COL,
    ver_col: str = ROW_VER_COL,
) -> DataFrame:
    """Attach ``row_id`` / ``row_commit_version`` to a scan produced by
    ``read_snapshot_df(..., file_path_col=fp_col, row_index_col=ri_col,
    extra_physical_cols=materialized_names(...))``. Drops the plumbing
    columns."""
    mat_id, mat_ver = materialized_names(snapshot.configuration)
    files = adds if adds is not None else list(snapshot.files.values())
    fmap = file_map_df(spark, files, table_path)
    out = df.join(F.broadcast(fmap), F.col(fp_col) == F.col("__rt_fp"), "left")
    out = out.withColumn(
        id_col, F.coalesce(F.col(mat_id), F.col("__rt_base") + F.col(ri_col))
    ).withColumn(ver_col, F.coalesce(F.col(mat_ver), F.col("__rt_ver")))
    return out.drop("__rt_fp", "__rt_base", "__rt_ver", fp_col, ri_col, mat_id, mat_ver)


def read_with_materialized(spark, snapshot: "Snapshot", table_path: str, files: list):
    """Scan ``files`` with the two materialized columns POPULATED from
    each row's CURRENT id/version (existing materialization wins, else
    baseRowId + row_index / defaultRowCommitVersion). This is the frame
    a rewrite filters or modifies and hands to write_files — the hidden
    columns ride into the new parquet, so ids survive the rewrite.
    Rows the rewrite MODIFIES should null their materialized version
    (the reader then falls back to the new file's
    defaultRowCommitVersion — exactly the rewriting commit)."""
    from delta_rs_spark.table import read_snapshot_df

    mat_id, mat_ver = materialized_names(snapshot.configuration)
    df = read_snapshot_df(
        spark,
        snapshot,
        table_path,
        files=files,
        file_path_col="__rt_file",
        row_index_col="__rt_index",
        extra_physical_cols=[mat_id, mat_ver],
    )
    fmap = file_map_df(spark, files, table_path)
    df = df.join(F.broadcast(fmap), F.col("__rt_file") == F.col("__rt_fp"), "left")
    df = df.withColumn(
        mat_id, F.coalesce(F.col(mat_id), F.col("__rt_base") + F.col("__rt_index"))
    ).withColumn(mat_ver, F.coalesce(F.col(mat_ver), F.col("__rt_ver")))
    return df.drop("__rt_fp", "__rt_base", "__rt_ver", "__rt_file", "__rt_index")
