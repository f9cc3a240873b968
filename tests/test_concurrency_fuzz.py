"""Racing-writers fuzz of the OCC commit protocol (r05 verdict #6).

Two layers:

1. A DETERMINISTIC differential fuzz of the conflict matrix: two
   transactions read the same version; the winner commits first, the
   loser's retry replays the winning commit(s) through
   _check_conflicts. An independent oracle (reimplementing the
   documented matrix from the reference's conflict_checker.rs classes)
   predicts accept vs the exact error class; the surviving log must
   replay to the predicted file set after every accepted commit.

2. A THREADED race of real operators (append/delete/update/compact) on
   one table. Losers must fail with a CommitFailedError subclass, and
   the surviving log is the source of truth: versions contiguous, every
   version replayable, and the final row count must equal the count
   implied by the surviving commits' own operationMetrics — a direct
   lost-update/phantom detector.

Reference model: crates/core/src/kernel/transaction/conflict_checker.rs,
python/tests/test_threaded.py.
"""

from __future__ import annotations

import json
import os
import random
import threading

import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.log import commit as C
from delta_rs_spark.log import snapshot as S
from delta_rs_spark.log.actions import (
    Add,
    CommitInfo,
    DomainMetadata,
    Metadata,
    Protocol,
    Remove,
    Txn,
)

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"type": "long", "name": "id", "nullable": True, "metadata": {}}
        ],
    }
)


def _add(path: str, data_change: bool = True) -> Add:
    return Add(
        path=path,
        size=1,
        modification_time=0,
        data_change=data_change,
        partition_values={},
        stats='{"numRecords": 1}',
    )


def _remove(path: str, data_change: bool = True) -> Remove:
    return Remove(path, 0, data_change, {})


def _mk_table(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    C.commit(
        path,
        [
            Protocol(1, 2),
            Metadata(schema_string=SCHEMA_JSON),
            _add("f0.parquet"),
            _add("f1.parquet"),
            _add("f2.parquet"),
        ],
        CommitInfo("CREATE TABLE", {}),
        read_version=-1,
    )


# --- independent conflict oracle (the matrix the reference documents) ---


def _oracle(winning_actions, txn: C.TransactionInfo, our_removes: set[str]):
    """Expected outcome of replaying one winning commit against a loser
    transaction: None = compatible, else the expected error class."""
    for a in winning_actions:
        if isinstance(a, Metadata):
            return C.MetadataChangedError
        if isinstance(a, Protocol):
            return C.ProtocolChangedError
        if isinstance(a, Txn) and a.app_id in txn.app_ids:
            return C.ConcurrentTransactionError
        if isinstance(a, DomainMetadata) and a.domain in txn.written_domains:
            return C.ConcurrentDomainMetadataError
        if isinstance(a, Remove):
            if a.path in our_removes:
                return C.ConcurrentDeleteDeleteError
            if txn.read_whole_table or a.path in txn.read_files:
                return C.ConcurrentDeleteReadError
        if isinstance(a, Add) and a.data_change:
            if txn.blind_append or txn.isolation_level == "SnapshotIsolation":
                continue
            if txn.isolation_level == "Serializable" or txn.read_whole_table:
                return C.ConcurrentAppendError
    return None


def _rand_txn_pair(rng: random.Random, live: list[str], fresh_id: list[int]):
    """One random transaction: (actions, TransactionInfo, effect) where
    effect = (added_paths, removed_paths) applied on success."""
    kind = rng.choice(
        ["blind_append", "delete", "update", "compact", "metadata",
         "protocol", "txn_marker", "domain", "reader_append"]
    )
    fresh_id[0] += 1
    new_path = f"n{fresh_id[0]}.parquet"
    iso = rng.choice(["Serializable", "WriteSerializable", "SnapshotIsolation"])
    if kind == "blind_append":
        return (
            [_add(new_path)],
            C.TransactionInfo(blind_append=True, isolation_level=iso),
            ({new_path}, set()),
        )
    if kind == "reader_append":
        # an append that READ part of the table first (e.g. MERGE insert)
        reads = set(rng.sample(live, k=min(len(live), rng.randint(1, 2))))
        return (
            [_add(new_path)],
            C.TransactionInfo(
                blind_append=False, read_files=reads, isolation_level=iso
            ),
            ({new_path}, set()),
        )
    if kind == "delete":
        victim = rng.choice(live)
        whole = rng.random() < 0.3
        return (
            [_remove(victim)],
            C.TransactionInfo(
                blind_append=False,
                read_files={victim},
                read_whole_table=whole,
                isolation_level=iso,
            ),
            (set(), {victim}),
        )
    if kind == "update":
        victim = rng.choice(live)
        return (
            [_remove(victim), _add(new_path)],
            C.TransactionInfo(
                blind_append=False, read_files={victim}, isolation_level=iso
            ),
            ({new_path}, {victim}),
        )
    if kind == "compact":
        victims = rng.sample(live, k=min(len(live), 2))
        return (
            [_remove(v, data_change=False) for v in victims]
            + [_add(new_path, data_change=False)],
            C.TransactionInfo(
                blind_append=False,
                read_files=set(victims),
                isolation_level=iso,
            ),
            ({new_path}, set(victims)),
        )
    if kind == "metadata":
        return (
            [Metadata(schema_string=SCHEMA_JSON)],
            C.TransactionInfo(blind_append=False, read_whole_table=True),
            (set(), set()),
        )
    if kind == "protocol":
        return (
            [Protocol(1, 2)],
            C.TransactionInfo(blind_append=False, read_whole_table=True),
            (set(), set()),
        )
    if kind == "txn_marker":
        app = rng.choice(["appA", "appB"])
        return (
            [Txn(app_id=app, version=rng.randint(1, 5)), _add(new_path)],
            C.TransactionInfo(
                blind_append=True, app_ids={app}, isolation_level=iso
            ),
            ({new_path}, set()),
        )
    app_domain = rng.choice(["d1", "d2"])
    return (
        [DomainMetadata(domain=app_domain, configuration="{}")],
        C.TransactionInfo(
            blind_append=False,
            read_whole_table=False,
            written_domains={app_domain},
            isolation_level=iso,
        ),
        (set(), set()),
    )


@pytest.mark.parametrize("seed", [7, 23, 61])
def test_conflict_matrix_differential_fuzz(tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"occ_{seed}")
    _mk_table(path)
    live = ["f0.parquet", "f1.parquet", "f2.parquet"]
    fresh = [0]
    version = 0

    for it in range(40):
        if len(live) < 3:  # keep victims available
            fresh[0] += 1
            p = f"r{fresh[0]}.parquet"
            C.commit(
                path, [_add(p)], CommitInfo("WRITE", {}), version,
                C.TransactionInfo(blind_append=True),
            )
            version += 1
            live.append(p)

        n_winners = rng.choice([1, 1, 1, 2])  # sometimes two winners stack
        winner_specs = []
        base_live = list(live)
        ok = True
        for _ in range(n_winners):
            w_actions, w_txn, w_eff = _rand_txn_pair(rng, live, fresh)
            # winners must themselves be valid against already-taken
            # winners this round; build them sequentially on real state
            winner_specs.append((w_actions, w_txn, w_eff))
            live = [p for p in live if p not in w_eff[1]] + sorted(w_eff[0])
            if not live:
                ok = False
                break
        if not ok:
            live = base_live
            continue
        l_actions, l_txn, l_eff = _rand_txn_pair(rng, base_live, fresh)

        read_version = version
        for w_actions, w_txn, _eff in winner_specs:
            got = C.commit(
                path, w_actions, CommitInfo("WRITE", {}), version, w_txn
            )
            version = got

        # oracle: replay each winning commit in order against the loser
        our_removes = {a.path for a in l_actions if isinstance(a, Remove)}
        expected = None
        for v in range(read_version + 1, version + 1):
            winning = S.read_commit_actions(path, v)
            expected = _oracle(winning, l_txn, our_removes)
            if expected is not None:
                break

        if expected is None:
            got = C.commit(
                path, l_actions, CommitInfo("WRITE", {}), read_version, l_txn
            )
            assert got == version + 1, (it, got, version)
            version = got
            live = [p for p in live if p not in l_eff[1]] + sorted(l_eff[0])
        else:
            with pytest.raises(expected):
                C.commit(
                    path, l_actions, CommitInfo("WRITE", {}), read_version, l_txn
                )
            assert S.latest_version(path) == version, "rejected commit landed"

        # the surviving log replays to exactly the tracked file set
        snap = S.load_snapshot(path)
        assert sorted(snap.files.keys()) == sorted(live), (
            it, sorted(snap.files.keys()), sorted(live),
        )


def test_threaded_operator_race_no_lost_updates(spark, tmp_path):
    """Real operators racing from threads: every loser raises a
    CommitFailedError subclass; afterwards the log alone must account
    for the final state (versions contiguous, each version replayable,
    final count == count implied by the surviving commits' metrics)."""
    path = str(tmp_path / "race")
    write_deltalake(path, spark.range(0, 100).select(F.col("id")))
    barrier = threading.Barrier(4)
    errors: list[Exception] = []
    unexpected: list[Exception] = []

    def worker(i: int) -> None:
        rng = random.Random(1000 + i)
        barrier.wait()
        for op in range(5):
            try:
                roll = rng.random()
                if roll < 0.4:
                    lo = 1000 * (10 * i + op)
                    write_deltalake(
                        path,
                        spark.range(lo, lo + 50).select(F.col("id")),
                        mode="append",
                    )
                elif roll < 0.7:
                    DeltaTable(path, spark=spark).delete(
                        f"id % 10 = {rng.randint(0, 9)}"
                    )
                elif roll < 0.9:
                    DeltaTable(path, spark=spark).update(
                        {"id": "id"}, predicate=f"id % 7 = {rng.randint(0, 6)}"
                    )
                else:
                    DeltaTable(path, spark=spark).optimize.compact()
            except C.CommitFailedError as e:
                errors.append(e)
            except Exception as e:  # anything else is a protocol bug
                unexpected.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not unexpected, unexpected

    latest = S.latest_version(path)
    assert latest is not None and latest >= 1
    # contiguous, fully replayable history
    expected_count = None
    for v in range(latest + 1):
        actions = S.read_commit_actions(path, v)  # raises if missing
        snap = S.load_snapshot(path, v)
        assert snap.version == v
        ci = next(a for a in actions if isinstance(a, CommitInfo))
        m = ci.operation_metrics or {}
        if v == 0:
            expected_count = 100
        elif ci.operation == "WRITE":
            expected_count += sum(
                int(json.loads(a.stats)["numRecords"])
                for a in actions
                if isinstance(a, Add) and a.data_change and a.stats
            )
        elif ci.operation == "DELETE":
            expected_count -= int(m.get("num_deleted_rows", 0))
        # UPDATE / OPTIMIZE are count-neutral
    t = DeltaTable(path, spark=spark)
    assert t.count() == expected_count, (t.count(), expected_count)
    # every file the final snapshot references exists on disk
    final = S.load_snapshot(path)
    for rel in final.files:
        assert os.path.exists(os.path.join(path, rel)), rel


def test_threaded_race_clone_refresh_no_lost_updates(spark, tmp_path):
    """r10: clone REFRESH (replace=True) racing real mutations from
    threads. The refresh is a whole-table-read commit, so every loser
    (either side) must raise a CommitFailedError subclass; afterwards
    the log alone must account for the final state — a CLONE commit
    resets the count to the (static) source's, WRITE/DELETE adjust it,
    and every referenced file (clone-local rel or source-absolute URI)
    must exist."""
    from delta_rs_spark import clone_table
    from delta_rs_spark.operators.util import resolve_add_path

    src = str(tmp_path / "seed")
    path = str(tmp_path / "clone")
    write_deltalake(src, spark.range(0, 100).select(F.col("id")))
    clone_table(src, path)
    barrier = threading.Barrier(4)
    errors: list[Exception] = []
    unexpected: list[Exception] = []

    def worker(i: int) -> None:
        rng = random.Random(7000 + i)
        barrier.wait()
        for op in range(5):
            try:
                roll = rng.random()
                if roll < 0.3:
                    lo = 1000 * (10 * i + op)
                    write_deltalake(
                        path,
                        spark.range(lo, lo + 50).select(F.col("id")),
                        mode="append",
                    )
                elif roll < 0.55:
                    DeltaTable(path, spark=spark).delete(
                        f"id % 10 = {rng.randint(0, 9)}"
                    )
                elif roll < 0.75:
                    DeltaTable(path, spark=spark).update(
                        {"id": "id"}, predicate=f"id % 7 = {rng.randint(0, 6)}"
                    )
                else:
                    clone_table(src, path, replace=True)
            except C.CommitFailedError as e:
                errors.append(e)
            except Exception as e:  # anything else is a protocol bug
                unexpected.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not unexpected, unexpected

    latest = S.latest_version(path)
    assert latest is not None and latest >= 1
    expected_count = None
    for v in range(latest + 1):
        actions = S.read_commit_actions(path, v)  # raises if missing
        snap = S.load_snapshot(path, v)
        assert snap.version == v
        ci = next(a for a in actions if isinstance(a, CommitInfo))
        m = ci.operation_metrics or {}
        if ci.operation == "CLONE":
            expected_count = 100  # the static seed's count
        elif ci.operation == "WRITE":
            expected_count += sum(
                int(json.loads(a.stats)["numRecords"])
                for a in actions
                if isinstance(a, Add) and a.data_change and a.stats
            )
        elif ci.operation == "DELETE":
            expected_count -= int(m.get("num_deleted_rows", 0))
    t = DeltaTable(path, spark=spark)
    assert t.count() == expected_count, (t.count(), expected_count)
    final = S.load_snapshot(path)
    for rel in final.files:
        assert os.path.exists(resolve_add_path(path, rel)), rel
