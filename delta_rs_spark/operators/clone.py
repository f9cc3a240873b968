"""SHALLOW CLONE — zero-copy table fork.

The Delta protocol allows Add actions to carry ABSOLUTE paths, which is
all a shallow clone is: the new table's version-0 log references the
SOURCE table's data files in place, so cloning costs O(metadata) no
matter the table size — the 100 TB "dev copy of prod" / experiment /
what-if shape (delta-spark's `CREATE TABLE ... SHALLOW CLONE`; the
reference has no equivalent operation — `crates/core/src/operations/
mod.rs` lists none — but its scan, like ours, resolves absolute add
paths per PROTOCOL.md "Add File and Remove File: path").

Isolation properties (pinned in tests/test_clone.py):
 - mutations on the clone rewrite only rows into files under the CLONE
   root and tombstone the absolute references; the source never changes;
 - VACUUM on the clone walks only the clone's directory, so source
   files are structurally unreachable from its delete set (and vice
   versa);
 - deletion-vector descriptors with 'u' (uuid-relative) storage resolve
   against their table's OWN root, so they are rewritten at clone time
   to absolute-path 'p' descriptors (offset/size preserved); inline
   'i' and already-absolute 'p' descriptors pass through.

The clone starts at version 0 with a FRESH table id, the source's
schema, partitioning, configuration (caller-overridable), and the
source's exact protocol (feature flags like deletionVectors must
survive, or the clone would refuse its own inherited DVs).
"""

from __future__ import annotations

import os

from delta_rs_spark.log import commit as commit_mod
from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.actions import Add, CommitInfo, Metadata, Protocol
from delta_rs_spark.log.commit import DeltaError, TransactionInfo


def clone_table(
    src_uri: str,
    dst_uri: str,
    version: int | None = None,
    name: str | None = None,
    description: str | None = None,
    configuration: dict[str, str] | None = None,
    commit_properties=None,
    post_commithook_properties=None,
) -> None:
    """Create a shallow clone of ``src_uri`` (optionally at a historic
    ``version`` — time-travel clone) at ``dst_uri``."""
    from delta_rs_spark.plans.deletion_vectors import dv_file_path

    src = str(src_uri).removeprefix("file://")
    dst = str(dst_uri).removeprefix("file://")
    if not snap_mod.is_delta_table(src):
        raise DeltaError(f"clone source is not a Delta table: {src}")
    if snap_mod.is_delta_table(dst):
        raise DeltaError(f"clone target already exists: {dst}")
    snapshot = snap_mod.load_snapshot(src, version)
    os.makedirs(dst, exist_ok=True)

    adds: list[Add] = []
    for a in snapshot.files.values():
        dv = a.deletion_vector
        if dv and dv.get("storageType") == "u":
            dv = {
                **dv,
                "storageType": "p",
                "pathOrInlineDv": dv_file_path(src, dv["pathOrInlineDv"]),
            }
        adds.append(
            Add(
                # join resolves an already-absolute a.path to itself, so
                # cloning a clone stays a one-hop absolute reference
                path=os.path.join(src, a.path),
                size=a.size,
                modification_time=a.modification_time,
                data_change=True,
                partition_values=a.partition_values,
                stats=a.stats,
                tags=a.tags,
                deletion_vector=dv,
            )
        )

    proto = snapshot.protocol or Protocol()
    meta = Metadata(
        schema_string=snapshot.schema_string,
        partition_columns=list(snapshot.partition_columns),
        configuration={**snapshot.configuration, **(configuration or {})},
        name=name,
        description=description,
    )
    op = CommitInfo(
        "CLONE",
        {
            "source": src,
            "sourceVersion": snapshot.version,
            "isShallow": True,
        },
        operation_metrics={
            "numClonedFiles": len(adds),
            "clonedBytes": sum(a.size for a in adds),
        },
    )
    commit_mod.commit(
        dst,
        [proto, meta, *adds],
        op,
        -1,
        TransactionInfo(blind_append=False, read_whole_table=True),
        commit_properties=commit_properties,
        post_commit=post_commithook_properties,
    )
