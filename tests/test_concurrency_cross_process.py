"""Cross-PROCESS OCC races (r06 verdict #4).

test_concurrency_fuzz.py races writers from threads inside one JVM /
one Python process — which shares the LogStore object and the OS file
table by construction. These tests spawn real subprocesses against one
table path so PosixHardLinkLogStore's os.link put-if-absent is
exercised across genuine process boundaries, the shape the reference
covers in crates/test/src/concurrent.rs.

Two layers:
1. raw commit-protocol workers (no Spark — pure log writes at maximum
   contention): the committed version sets must be PAIRWISE DISJOINT
   (two processes both believing they own version v is a lost update =
   broken put-if-absent), the log contiguous, and the final snapshot
   must replay to exactly the surviving adds;
2. full-stack workers (one SparkSession per process, real operators):
   losers fail cleanly, the log replays, and the final row count equals
   the count implied by the surviving commits' own operationMetrics.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from delta_rs_spark.log import snapshot as S

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "occ_worker.py")


def _spawn(args: list[str], env_extra: dict[str, str] | None = None):
    env = dict(os.environ)
    env.update(env_extra or {})
    return subprocess.Popen(
        [sys.executable, WORKER, *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        text=True,
    )


def _results(procs) -> list[dict]:
    out = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker crashed:\n{stderr[-2000:]}"
        out.append(json.loads(stdout.strip().splitlines()[-1]))
    return out


def test_cross_process_raw_commit_race_no_lost_versions(tmp_path):
    from delta_rs_spark.log import commit as C
    from delta_rs_spark.log.actions import CommitInfo, Metadata, Protocol

    from tests.occ_worker import _add

    table = str(tmp_path / "raw_race")
    os.makedirs(table)
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"type": "long", "name": "id", "nullable": True, "metadata": {}}
            ],
        }
    )
    C.commit(
        table,
        [Protocol(1, 2), Metadata(schema_string=schema), _add("seed.parquet")],
        CommitInfo("CREATE TABLE", {}),
        read_version=-1,
    )

    n_workers, n_ops = 3, 30
    procs = [
        _spawn([table, str(i), str(n_ops), str(7000 + i)])
        for i in range(n_workers)
    ]
    results = _results(procs)

    # 1) atomicity: no version claimed by two processes
    claims: dict[int, int] = {}
    for r in results:
        for v, _kind, _f in r["committed"]:
            assert v not in claims, (
                f"version {v} claimed by workers {claims[v]} and {r['worker']}"
                " — put-if-absent lost an update across processes"
            )
            claims[v] = r["worker"]
    # contention actually happened (else the test proved nothing)
    assert sum(r["losses"] for r in results) + len(claims) >= n_workers * n_ops // 2
    assert len(claims) > n_workers  # and real interleaving occurred

    # 2) contiguous, replayable log; every committed version present
    latest = S.latest_version(table)
    assert latest is not None and latest == max(claims)
    for v in range(latest + 1):
        S.read_commit_actions(table, v)  # raises if a version is missing

    # 3) final snapshot == offline replay of the workers' surviving ops
    expect = {"seed.parquet"}
    for v in sorted(claims):
        r = next(x for x in results if x["worker"] == claims[v])
        _, kind, f = next(c for c in r["committed"] if c[0] == v)
        if kind == "add":
            expect.add(f)
        else:
            assert f in expect, f"remove of non-live file {f} committed"
            expect.discard(f)
    snap = S.load_snapshot(table)
    assert set(snap.files) == expect


def test_cross_process_spark_operator_race(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.log.actions import Add, CommitInfo

    table = str(tmp_path / "spark_race")
    write_deltalake(table, spark.range(0, 100).select(F.col("id")))

    procs = [
        _spawn(
            [table, str(i), "5", str(9000 + i), "spark"],
            env_extra={"SPARK_GRAFT_DRIVER_MEM": "3g"},
        )
        for i in range(2)
    ]
    results = _results(procs)
    assert all(r["n_ok"] >= 1 for r in results)

    latest = S.latest_version(table)
    assert latest is not None and latest >= 2
    # replay the whole log: contiguous versions, and the final count
    # equals the count implied by the surviving commits' own metrics
    expected = None
    for v in range(latest + 1):
        actions = S.read_commit_actions(table, v)
        ci = next(a for a in actions if isinstance(a, CommitInfo))
        m = ci.operation_metrics or {}
        if v == 0:
            expected = 100
        elif ci.operation == "WRITE":
            expected += sum(
                int(json.loads(a.stats)["numRecords"])
                for a in actions
                if isinstance(a, Add) and a.data_change and a.stats
            )
        elif ci.operation == "DELETE":
            expected -= int(m.get("num_deleted_rows", 0))
        # OPTIMIZE is count-neutral
    t = DeltaTable(table, spark=spark)
    assert t.count() == expected, (t.count(), expected)
    snap = S.load_snapshot(table)
    for rel in snap.files:
        assert os.path.exists(os.path.join(table, rel)), rel
