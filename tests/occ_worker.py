"""Cross-process OCC race worker (spawned by test_concurrency_cross_process).

Runs the commit protocol DIRECTLY (no Spark JVM) against a shared table
path: blind appends of fresh files plus whole-table-read deletes of live
files, with commit()'s internal conflict replay doing the retries. The
point is the layer threads can never exercise: PosixHardLinkLogStore's
os.link put-if-absent racing across REAL process boundaries (the shape
the reference covers in crates/test/src/concurrent.rs with N tokio
workers appending to one table).

Emits ONE stdout JSON line:
  {"worker": id, "committed": [[version, kind, file], ...], "losses": n}

The parent asserts the committed version sets are pairwise disjoint
(two processes both believing they own version v = a lost update =
broken put-if-absent), the log is contiguous, and the final snapshot
replays to exactly the surviving adds.
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_rs_spark.log import commit as C
from delta_rs_spark.log import snapshot as S
from delta_rs_spark.log.actions import Add, CommitInfo, Remove


def _add(path: str) -> Add:
    return Add(
        path=path,
        size=1,
        modification_time=0,
        data_change=True,
        partition_values={},
        stats='{"numRecords": 1}',
    )


def main_spark(table: str, wid: int, n_ops: int, seed: int) -> None:
    """Full-stack variant: a real SparkSession per process running real
    operators (append / delete / compact) against the shared table —
    the reference's python/tests/test_threaded.py shape, but across
    process boundaries. Per-op committed versions are not observable
    race-free from up here, so the parent checks global log invariants
    (contiguity, replayability, metrics-implied count) instead of
    version disjointness — the raw mode pins that exactly."""
    from pyspark.sql import functions as F

    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.session import get_spark

    rng = random.Random(seed)
    spark = get_spark(f"occ-w{wid}", cpus=4, shuffle_partitions=4)
    n_ok = losses = 0
    for op in range(n_ops):
        try:
            roll = rng.random()
            if roll < 0.55:
                lo = 1000 * (10 * wid + op)
                write_deltalake(
                    table,
                    spark.range(lo, lo + 50).select(F.col("id")),
                    mode="append",
                )
            elif roll < 0.9:
                DeltaTable(table, spark=spark).delete(
                    f"id % 10 = {rng.randint(0, 9)}"
                )
            else:
                DeltaTable(table, spark=spark).optimize.compact()
            n_ok += 1
        except C.CommitFailedError:
            losses += 1
    spark.stop()
    print(json.dumps({"worker": wid, "n_ok": n_ok, "losses": losses}))


def main() -> None:
    table, wid, n_ops, seed = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    if len(sys.argv) > 5 and sys.argv[5] == "spark":
        main_spark(table, wid, n_ops, seed)
        return
    rng = random.Random(seed)
    committed: list[list] = []
    losses = 0
    for op in range(n_ops):
        latest = S.latest_version(table)
        assert latest is not None
        try:
            if rng.random() < 0.7:
                fname = f"w{wid}-{op}.parquet"
                v = C.commit(
                    table,
                    [_add(fname)],
                    CommitInfo("WRITE", {"mode": "Append"}),
                    read_version=latest,
                    txn_info=C.TransactionInfo(blind_append=True),
                )
                committed.append([v, "add", fname])
            else:
                snap = S.load_snapshot(table, latest)
                live = sorted(snap.files)
                if not live:
                    continue
                victim = live[rng.randrange(len(live))]
                v = C.commit(
                    table,
                    [Remove(victim, 0, True, {})],
                    CommitInfo("DELETE", {}),
                    read_version=latest,
                    txn_info=C.TransactionInfo(
                        blind_append=False, read_whole_table=True
                    ),
                )
                committed.append([v, "remove", victim])
        except C.CommitFailedError:
            losses += 1  # expected under contention; never a crash
    print(json.dumps({"worker": wid, "committed": committed, "losses": losses}))


if __name__ == "__main__":
    main()
