"""GENERATE symlink_format_manifest — Presto/BigQuery manifests.

(reference: crates/core/src/operations/generate.rs; python surface
python/deltalake/table.py:532-561)
"""

from __future__ import annotations

import os
import shutil

from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.operators.util import resolve_add_path

MANIFEST_DIR = "_symlink_format_manifest"


def generate_symlink_manifest(table_path: str) -> list[str]:
    """Write one ``manifest`` text file of absolute file URIs per
    partition directory (or at the root for unpartitioned tables)."""
    snapshot = snap_mod.load_snapshot(table_path)
    if any(a.deletion_vector for a in snapshot.files.values()):
        # a symlink manifest lists raw files; an external reader following
        # it would resurrect DV-deleted rows (delta-spark refuses too)
        from delta_rs_spark.log.commit import DeltaError

        raise DeltaError(
            "cannot generate a symlink manifest for a table with deletion "
            "vectors; run optimize.reorg_purge() first"
        )
    out_root = os.path.join(table_path, MANIFEST_DIR)
    shutil.rmtree(out_root, ignore_errors=True)
    groups: dict[str, list[str]] = {}
    for add in snapshot.files.values():
        rel_dir = os.path.dirname(add.path)
        uri = "file://" + os.path.abspath(resolve_add_path(table_path, add.path))
        groups.setdefault(rel_dir, []).append(uri)
    written = []
    for rel_dir, uris in groups.items():
        d = os.path.join(out_root, rel_dir) if rel_dir else out_root
        os.makedirs(d, exist_ok=True)
        mf = os.path.join(d, "manifest")
        with open(mf, "w") as f:
            f.write("\n".join(sorted(uris)) + "\n")
        written.append(mf)
    return written
