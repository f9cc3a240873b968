"""table_diff (operators/diff.py): version-to-version logical diff.

The oracle gate (delta_table_diff_op) pins the insert/update/delete
classification end-to-end; these tests pin the properties the gate's
single-file scratch table cannot witness — churned-file pruning,
physical-churn suppression, DV-descriptor churn, key validation, and
schema evolution across the diffed versions.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.log.commit import DeltaError
from delta_rs_spark.log.snapshot import load_snapshot
from delta_rs_spark.operators.diff import churned_files


def _mk(spark, path, rows, partition_by=None, configuration=None, one_file=False):
    df = spark.createDataFrame(rows, ["k", "part", "val"])
    if one_file:
        df = df.coalesce(1)
    write_deltalake(
        path, df, partition_by=partition_by, configuration=configuration
    )
    return DeltaTable(path, spark=spark)


def test_diff_prunes_untouched_partition_files(spark, tmp_path):
    """Mutating one partition must leave the other partition's files
    OUT of both churned sets — the diff never reads them."""
    path = str(tmp_path / "t")
    rows = [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(100)]
    dt = _mk(spark, path, rows, partition_by=["part"])
    dt.update({"val": "val + 1"}, predicate="part = 'a' AND k < 10")
    dt.update_incremental()

    old_c, new_c = churned_files(load_snapshot(path, 0), load_snapshot(path, 1))
    assert old_c and new_c
    assert all(a.partition_values.get("part") == "a" for a in old_c + new_c)

    got = {
        (r.k, r.change_type, r.old_val, r.new_val)
        for r in dt.diff(["k"], 0).collect()
    }
    assert got == {(i, "update", i * 10, i * 10 + 1) for i in range(0, 10, 2)}


def test_diff_compaction_only_is_empty(spark, tmp_path):
    """OPTIMIZE between the versions rewrites every row physically but
    changes nothing logically — the diff must be empty (rows joined
    equal on all compared columns are dropped)."""
    path = str(tmp_path / "t")
    dt = _mk(spark, path, [(i, "a", i) for i in range(50)])
    write_deltalake(
        path,
        spark.createDataFrame([(i, "a", i) for i in range(50, 80)], ["k", "part", "val"]),
        mode="append",
    )
    dt.update_incremental()
    dt.optimize.compact()
    dt.update_incremental()
    # the compacted version differs in every file path...
    old_c, new_c = churned_files(load_snapshot(path, 1), load_snapshot(path, 2))
    assert old_c and new_c
    # ...yet the logical diff is empty
    assert dt.diff(["k"], 1, 2).count() == 0
    # and diffing across the append still reports ONLY the inserts
    assert dt.diff(["k"], 0, 2).groupBy("change_type").count().collect()[0][
        "count"
    ] == 30


def test_diff_sees_dv_soft_delete_as_churn(spark, tmp_path):
    """A DV delete keeps the file path and mutates only the DV
    descriptor — same-path files with different DVs must be treated as
    churned on BOTH sides and classify as deletes."""
    path = str(tmp_path / "t")
    dt = _mk(
        spark,
        path,
        [(i, "a", i) for i in range(40)],
        configuration={"delta.enableDeletionVectors": "true"},
    )
    dt.delete("k < 5")
    dt.update_incremental()
    s0, s1 = load_snapshot(path, 0), load_snapshot(path, 1)
    # the soft delete rewrote no data file
    assert set(s0.files) & set(s1.files), "expected a shared-path DV mutation"
    got = {(r.k, r.change_type, r.old_val) for r in dt.diff(["k"], 0).collect()}
    assert got == {(i, "delete", i) for i in range(5)}


def test_diff_duplicate_keys_raise_and_can_be_skipped(spark, tmp_path):
    path = str(tmp_path / "t")
    # one file, so the partial delete rewrites it and the duplicated
    # key is inside the churned row set (spread across files, a fully-
    # matching file is dropped without scanning — no dup in churn)
    dt = _mk(spark, path, [(1, "a", 1), (1, "a", 2), (2, "a", 3)], one_file=True)
    dt.delete("val = 3")
    dt.update_incremental()
    with pytest.raises(DeltaError, match="unique keys"):
        dt.diff(["k"], 0).collect()
    # opting out still works for callers with their own guarantees
    rows = dt.diff(["k"], 0, validate_unique_keys=False).collect()
    assert {r.change_type for r in rows} <= {"delete", "update"}


def test_diff_schema_evolution_compares_common_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    dt = _mk(spark, path, [(i, "a", i) for i in range(10)])
    evolved = spark.createDataFrame(
        [(100, "a", 100, "x")], ["k", "part", "val", "extra"]
    )
    write_deltalake(path, evolved, mode="append", schema_mode="merge")
    dt.update_incremental()
    got = {(r.k, r.change_type, r.new_val) for r in dt.diff(["k"], 0).collect()}
    assert got == {(100, "insert", 100)}
    with pytest.raises(DeltaError, match="absent in a version"):
        dt.diff(["k"], 0, compare_cols=["extra"])


def test_diff_version_order_and_key_presence_validated(spark, tmp_path):
    path = str(tmp_path / "t")
    dt = _mk(spark, path, [(1, "a", 1)])
    dt.delete("k = 1")
    dt.update_incremental()
    with pytest.raises(ValueError, match="starting_version"):
        dt.diff(["k"], 1, 0)
    with pytest.raises(DeltaError, match="key column"):
        dt.diff(["nope"], 0)
