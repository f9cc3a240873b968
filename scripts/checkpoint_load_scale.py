"""V2 checkpoint READ: serial row-materialized vs parallel columnar.

The write side ships bounded sidecars whose whole 100 TB argument is
that a reader pool consumes them in parallel (reference precedent: the
kernel replays checkpoints as Arrow batch streams,
crates/core/src/kernel/snapshot/stream.rs). r12 makes this engine's own
reader match: ``read_checkpoint`` fetches sidecars with a thread pool
(parquet decode releases the GIL) and ``_actions_from_arrow`` extracts
the add/remove payload from flat per-field arrays instead of per-row
nested dicts. This script pins the speedup on checkpoints of
50k/200k/800k synthetic add actions split across >=8 sidecars,
comparing the OLD path (sequential ``pq.read_table().to_pylist()`` per
sidecar through the row-dict parser) against ``read_checkpoint``, and
asserts both decode identical action sets.

No Spark needed — the checkpoint layer is pure pyarrow.

Usage: python scripts/checkpoint_load_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from delta_rs_spark.log import snapshot as snap_mod  # noqa: E402
from delta_rs_spark.log.actions import (  # noqa: E402
    Add,
    Metadata,
    Protocol,
    Remove,
)

ROOT = f"/tmp/cp_load_scale_{os.getpid()}"
SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
)


def build(n_adds: int) -> str:
    """A synthetic snapshot of n_adds live files (+ n_adds/10 tombstones)
    checkpointed as V2 with >=8 sidecars."""
    path = os.path.join(ROOT, f"t{n_adds}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(snap_mod.log_dir(path))
    snap = snap_mod.Snapshot(table_path=path, version=1)
    snap.protocol = Protocol(3, 7, ["v2Checkpoint"], ["v2Checkpoint"])
    snap.metadata = Metadata(schema_string=SCHEMA)
    for i in range(n_adds):
        snap.files[f"part-{i:08d}.parquet"] = Add(
            path=f"part-{i:08d}.parquet",
            size=1 << 20,
            modification_time=1700000000000 + i,
            data_change=False,
            partition_values={},
            stats=json.dumps(
                {
                    "numRecords": 1000,
                    "minValues": {"id": i * 1000, "v": 0},
                    "maxValues": {"id": i * 1000 + 999, "v": 2 * i},
                    "nullCount": {"id": 0, "v": 0},
                }
            ),
        )
    for i in range(n_adds // 10):
        snap.tombstones.append(
            Remove(f"old-{i:08d}.parquet", 1700000000000, True, size=1 << 20)
        )
    snap_mod.write_checkpoint(
        path, snap, v2=True, sidecar_target_actions=max(1, n_adds // 8)
    )
    return path


def load_serial_rows(path: str) -> list:
    """The pre-r12 read path: top-level row parse, then each sidecar
    sequentially via pq.read_table().to_pylist()."""
    table = pq.read_table(snap_mod.find_checkpoint_file(path, 1))
    actions = snap_mod._actions_from_parquet_rows(table.to_pylist())
    out = [a for a in actions if not isinstance(a, snap_mod.Sidecar)]
    for a in actions:
        if isinstance(a, snap_mod.Sidecar):
            p = os.path.join(snap_mod.log_dir(path), "_sidecars", a.path)
            out.extend(
                snap_mod._actions_from_parquet_rows(pq.read_table(p).to_pylist())
            )
    return out


def key(a) -> tuple:
    return (type(a).__name__, getattr(a, "path", None) or getattr(a, "id", ""))


def main() -> None:
    print(f"{'adds':>8} {'sidecars':>8} {'serial_rows_s':>13} "
          f"{'parallel_cols_s':>15} {'speedup':>8}")
    for n in (50_000, 200_000, 800_000):
        path = build(n)
        sc_dir = os.path.join(snap_mod.log_dir(path), "_sidecars")
        n_sc = len(os.listdir(sc_dir))
        # warm the page cache so both measure decode, not disk
        load_serial_rows(path)
        t0 = time.time()
        old = load_serial_rows(path)
        t_old = time.time() - t0
        t0 = time.time()
        new = snap_mod.read_checkpoint(path, 1)
        t_new = time.time() - t0
        assert sorted(map(key, old)) == sorted(map(key, new))
        n_add_old = sum(isinstance(a, Add) for a in old)
        n_add_new = sum(isinstance(a, Add) for a in new)
        assert n_add_old == n_add_new == n, (n_add_old, n_add_new)
        # spot-check full fidelity on one add
        sample_old = next(a for a in old if isinstance(a, Add))
        sample_new = next(a for a in new if a.__class__ is Add and a.path == sample_old.path)
        assert sample_old == sample_new
        print(f"{n:>8} {n_sc:>8} {t_old:>13.2f} {t_new:>15.2f} "
              f"{t_old / max(t_new, 1e-9):>7.1f}x")
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
