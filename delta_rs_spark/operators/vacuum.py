"""VACUUM — delete unreferenced data files past retention.

(reference: crates/core/src/operations/vacuum.rs — plan :226, execute
:478, stale-file logic :632; python/deltalake/table.py:607-684)

Candidates = on-disk data files that are NOT in the active snapshot and
are tombstoned (or orphaned, with ``full=True``) with deletion/modification
time older than the retention window. Retention default comes from
``delta.deletedFileRetentionDuration`` (1 week), and shortening it below
default requires ``enforce_retention_duration=False`` — same guard the
reference and delta-spark apply.
"""

from __future__ import annotations

import os
import re
import time

from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.operators.util import resolve_add_path
from delta_rs_spark.log.actions import CommitInfo
from delta_rs_spark.log.commit import DeltaError, TransactionInfo
from delta_rs_spark.log import commit as commit_mod

DEFAULT_RETENTION_HOURS = 24 * 7
_INTERVAL_RE = re.compile(r"interval\s+(\d+)\s+(hour|day|week)s?", re.IGNORECASE)


def _configured_retention_hours(config: dict[str, str]) -> int:
    raw = config.get("delta.deletedFileRetentionDuration")
    if not raw:
        return DEFAULT_RETENTION_HOURS
    m = _INTERVAL_RE.match(raw.strip())
    if not m:
        return DEFAULT_RETENTION_HOURS
    n, unit = int(m.group(1)), m.group(2).lower()
    return n * {"hour": 1, "day": 24, "week": 24 * 7}[unit]


def _walk_data_files(table_path: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(table_path):
        dirs[:] = [
            d for d in dirs if d not in ("_delta_log",) and not d.startswith("_staging")
        ]
        for fn in files:
            if fn.startswith((".", "_")):
                continue
            rel = os.path.relpath(os.path.join(root, fn), table_path).replace(os.sep, "/")
            if rel.startswith(("_delta_log/",)):
                continue
            out.append(rel)
    return out


def vacuum(
    table_path: str,
    retention_hours: int | None = None,
    dry_run: bool = True,
    enforce_retention_duration: bool = True,
    full: bool = False,
    keep_versions: list[int] | None = None,
    lite: bool = False,
) -> list[str]:
    """``lite=True`` is VACUUM LITE (delta-spark 3.3 semantics): deletion
    candidates come from the transaction log's tombstones instead of a
    full storage listing — O(tombstones in the log), not O(files under
    the table root). At 100 TB the recursive LIST is the dominant cost
    of a routine vacuum (millions of objects, paginated store calls);
    LITE skips it entirely. Trade-off (same as delta-spark): orphans no
    log entry references and aged _change_data files are NOT found —
    run a classic/FULL vacuum occasionally for those. ``lite`` and
    ``full`` are contradictory and rejected together."""
    snapshot = snap_mod.load_snapshot(table_path)
    configured = _configured_retention_hours(snapshot.configuration)
    if retention_hours is None:
        retention_hours = configured
    if retention_hours < 0:
        raise DeltaError("retention_hours must be >= 0")
    if enforce_retention_duration and retention_hours < configured:
        raise DeltaError(
            f"retention ({retention_hours}h) below configured minimum "
            f"({configured}h); pass enforce_retention_duration=False to override"
        )
    cutoff_ms = (time.time() - retention_hours * 3600) * 1000

    def referenced(snap) -> set[str]:
        """Data files plus any DV sidecars their adds point at — a
        referenced deletion_vector_*.bin is part of the live table."""
        out = set(snap.files.keys())
        for a in snap.files.values():
            dv = a.deletion_vector
            if dv and dv.get("storageType") in ("u", "p"):
                from delta_rs_spark.plans.deletion_vectors import dv_file_path

                p = (
                    dv_file_path(table_path, dv["pathOrInlineDv"])
                    if dv["storageType"] == "u"
                    else resolve_add_path(table_path, dv["pathOrInlineDv"])
                )
                out.add(os.path.relpath(p, table_path))
        return out

    active = referenced(snapshot)
    # keep_versions: every file referenced by a protected historical
    # version survives, so time travel to it stays intact
    # (reference: python/deltalake/table.py:607-684 keep_versions)
    for kv in keep_versions or []:
        active |= referenced(snap_mod.load_snapshot(table_path, kv))
    tombstoned = {r.path: r.deletion_timestamp for r in snapshot.tombstones}
    # a remove that tombstones a (path, DV) pairing retires that DV
    # sidecar: each DV merge writes a fresh uuid file, so superseded
    # sidecars are reclaimable like any tombstoned data file (unless a
    # protected version still references them — `active` covers that)
    dv_tombstoned: dict[str, int] = {}
    for r in snapshot.tombstones:
        dv = getattr(r, "deletion_vector", None)
        if dv and dv.get("storageType") in ("u", "p"):
            from delta_rs_spark.plans.deletion_vectors import dv_file_path

            p = (
                dv_file_path(table_path, dv["pathOrInlineDv"])
                if dv["storageType"] == "u"
                else resolve_add_path(table_path, dv["pathOrInlineDv"])
            )
            dv_tombstoned[os.path.relpath(p, table_path)] = r.deletion_timestamp
    if lite and full:
        raise DeltaError("vacuum(lite=True, full=True) is contradictory: "
                         "FULL needs the listing LITE exists to avoid")
    candidates: list[str] = []
    if lite:
        # log-driven: the tombstone sets above already hold every
        # (path, deletionTimestamp) the log knows about — no listing.
        # Candidates MUST resolve inside the table root: on a shallow
        # clone, tombstoned 'p' DV descriptors (and absolute add paths)
        # resolve to the SOURCE table, and deleting there would break
        # clone/vacuum isolation. Classic vacuum is structurally safe
        # because _walk_data_files never yields paths outside the root;
        # LITE has to enforce the same boundary explicitly.
        root = os.path.realpath(table_path)
        for rel, ts_ms in {**tombstoned, **dv_tombstoned}.items():
            if rel in active or ts_ms > cutoff_ms:
                continue
            full_p = os.path.realpath(os.path.join(table_path, rel))
            if os.path.commonpath([root, full_p]) != root:
                continue  # escapes the table root (clone source etc.)
            if os.path.exists(full_p):
                candidates.append(rel)
        candidates = sorted(set(candidates))
    for rel in _walk_data_files(table_path) if not lite else []:
        if rel in active:
            continue
        if rel.startswith("_change_data/"):
            # CDC files are never in the active set; reclaim them once
            # older than retention (bounds how far back load_cdf reaches,
            # same trade-off as Delta's VACUUM)
            mtime_ms = os.path.getmtime(os.path.join(table_path, rel)) * 1000
            if mtime_ms <= cutoff_ms:
                candidates.append(rel)
            continue
        if rel in tombstoned:
            if tombstoned[rel] <= cutoff_ms:
                candidates.append(rel)
        elif rel in dv_tombstoned:
            if dv_tombstoned[rel] <= cutoff_ms:
                candidates.append(rel)
        elif full:
            # orphan not referenced by any log entry (VACUUM FULL)
            mtime_ms = os.path.getmtime(os.path.join(table_path, rel)) * 1000
            if mtime_ms <= cutoff_ms:
                candidates.append(rel)

    if dry_run:
        return sorted(candidates)

    start = CommitInfo(
        "VACUUM START",
        {"retentionCheckEnabled": enforce_retention_duration},
        operation_metrics={"numFilesToDelete": len(candidates)},
    )
    v = commit_mod.commit(
        table_path, [], start, snapshot.version, TransactionInfo(blind_append=True)
    )
    deleted = 0
    for rel in candidates:
        try:
            os.unlink(os.path.join(table_path, rel))
            deleted += 1
        except FileNotFoundError:
            pass
    end = CommitInfo(
        "VACUUM END", {"status": "COMPLETED"}, operation_metrics={"numDeletedFiles": deleted}
    )
    commit_mod.commit(table_path, [], end, v, TransactionInfo(blind_append=True))
    return sorted(candidates)


def cleanup_metadata(
    table_path: str,
    retention_hours: int | None = None,
    keep_version: int | None = None,
) -> int:
    """Delete expired log files up to a SAFE checkpoint boundary
    (reference protocol/checkpoints.rs cleanup_expired_logs_for).

    ``keep_version`` is the version the caller's snapshot is loaded at
    (the reference passes snapshot.version()): nothing at or above it is
    ever deleted, it is first lowered to the oldest version still inside
    the retention window (no holes in the window), and cleanup then
    requires a checkpoint at-or-below it to serve as the replay floor —
    if none exists the call deletes NOTHING (reference issue #3692: a
    cleanup not aligned to a checkpoint strands every remaining
    version). Only files strictly below that safe checkpoint AND older
    than the cutoff are removed."""
    snapshot = snap_mod.load_snapshot(table_path)
    raw = snapshot.configuration.get("delta.logRetentionDuration", "interval 30 days")
    if retention_hours is None:
        m = _INTERVAL_RE.match(raw.strip())
        retention_hours = (
            int(m.group(1)) * {"hour": 1, "day": 24, "week": 168}[m.group(2).lower()]
            if m
            else 720
        )
    cutoff = time.time() - retention_hours * 3600
    commits, checkpoints = snap_mod.list_log(table_path)
    if not checkpoints:
        return 0
    if keep_version is None:
        keep_version = max(commits + checkpoints)
    # retention-window floor: every version with ANY log file still
    # inside the window stays, and so does everything after it
    _log = snap_mod.log_dir(table_path)
    in_window = []
    for f in os.listdir(_log):
        m = (
            snap_mod._COMMIT_RE.match(f)
            or snap_mod._CHECKPOINT_RE.match(f)
            or snap_mod._CHECKPOINT_V2_RE.match(f)
            or snap_mod._CHECKPOINT_V2_JSON_RE.match(f)
        )
        if m and os.path.getmtime(os.path.join(_log, f)) >= cutoff:
            in_window.append(int(m.group(1)))
    if in_window:
        keep_version = min(keep_version, min(in_window))
    safe_cps = [v for v in checkpoints if v <= keep_version]
    if not safe_cps:
        return 0
    last_cp = max(safe_cps)
    n = 0
    for v in commits:
        if v >= last_cp:
            continue
        p = snap_mod.commit_file(table_path, v)
        if os.path.getmtime(p) <= cutoff:
            os.unlink(p)
            n += 1
    # superseded checkpoints below the newest one are dead weight (the
    # reader always starts from the latest at-or-before target, and the
    # commits below them are being expired above) — at large table sizes
    # each is a multi-MB..GB parquet, and for V2 its sidecars multiply
    # that. Delete expired ones, then any sidecar no surviving
    # checkpoint references (ours are written per-checkpoint, never
    # shared; foreign shared sidecars survive because their referencing
    # checkpoint does).
    log = snap_mod.log_dir(table_path)

    def _is_cp(f: str):
        return (
            snap_mod._CHECKPOINT_RE.match(f)
            or snap_mod._CHECKPOINT_V2_RE.match(f)
            or snap_mod._CHECKPOINT_V2_JSON_RE.match(f)
        )

    removed_cp = False
    for f in list(os.listdir(log)):
        m = _is_cp(f)
        if not m or int(m.group(1)) >= last_cp:
            continue
        p = os.path.join(log, f)
        if os.path.getmtime(p) <= cutoff:
            os.unlink(p)
            removed_cp = True
            n += 1
    sidecar_dir = os.path.join(log, "_sidecars")
    if removed_cp and os.path.isdir(sidecar_dir):
        import json as _json

        import pyarrow.parquet as pq

        referenced: set[str] = set()
        for f in os.listdir(log):
            if not _is_cp(f):
                continue
            p = os.path.join(log, f)
            if f.endswith(".json"):  # JSON V2 top-level checkpoint
                with open(p, encoding="utf-8") as fh:
                    for line in fh:
                        try:
                            sc = _json.loads(line).get("sidecar")
                        except ValueError:
                            continue
                        if sc and sc.get("path"):
                            referenced.add(os.path.basename(sc["path"]))
                continue
            pf = pq.ParquetFile(p)
            if "sidecar" not in pf.schema_arrow.names:
                continue  # classic checkpoint: no sidecar column
            # column-pruned read: only the sidecar struct, never the
            # (possibly huge) add/remove payload
            for row in pf.read(columns=["sidecar"]).to_pylist():
                sc = row.get("sidecar")
                if sc and sc.get("path"):
                    referenced.add(os.path.basename(sc["path"]))
        for f in list(os.listdir(sidecar_dir)):
            p = os.path.join(sidecar_dir, f)
            if f not in referenced and os.path.getmtime(p) <= cutoff:
                os.unlink(p)
                n += 1
    return n
