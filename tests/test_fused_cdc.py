"""Focused tests for the r13 fused data+CDC single-job writer
(operators/cdc.write_data_and_change_files) and the cache-release
contract (session.drop_cached_intermediates)."""

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.operators.cdc import can_fuse_cdc_write


def _parquet_cols(path):
    return set(pq.ParquetFile(path).schema_arrow.names)


def _data_files(root):
    out = []
    for dirpath, dirnames, files in os.walk(root):
        if "_delta_log" in dirpath or "_change_data" in dirpath:
            continue
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


def _cdc_files(root):
    cd = os.path.join(root, "_change_data")
    out = []
    for dirpath, _d, files in os.walk(cd):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


def test_fused_delete_layout_and_values(spark, tmp_table):
    df = spark.range(0, 40).selectExpr("id", "cast(id as double) AS v")
    write_deltalake(
        tmp_table, df, configuration={"delta.enableChangeDataFeed": "true"}
    )
    t = DeltaTable(tmp_table)
    m = t.delete("id >= 30")
    assert m["num_deleted_rows"] == 10
    assert {r["id"] for r in t.to_spark().collect()} == set(range(30))
    # protocol layout: data files carry ONLY table columns; change
    # files carry table columns + _change_type inside the file
    for f in _data_files(tmp_table):
        assert "_change_type" not in _parquet_cols(f), f
    cdc = _cdc_files(tmp_table)
    assert cdc, "fused delete must emit change files"
    for f in cdc:
        assert "_change_type" in _parquet_cols(f), f
    got = t.load_cdf(starting_version=1, ending_version=1).collect()
    assert {r["id"] for r in got if r["_change_type"] == "delete"} == set(
        range(30, 40)
    )
    # no staging directories left behind
    assert not [d for d in os.listdir(tmp_table) if d.startswith("_staging")]


def test_fused_update_partitioned(spark, tmp_table):
    df = spark.range(0, 30).selectExpr(
        "id", "cast(id % 3 as int) AS part", "cast(id as double) AS v"
    )
    write_deltalake(
        tmp_table,
        df,
        partition_by=["part"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable(tmp_table)
    m = t.update({"v": "v + 0.5"}, predicate="id < 6")
    assert m["num_updated_rows"] == 6
    got = {r["id"]: r["v"] for r in t.to_spark().collect()}
    assert got[0] == 0.5 and got[5] == 5.5 and got[10] == 10.0
    cdf = t.load_cdf(starting_version=1, ending_version=1).collect()
    pre = {r["id"]: r["v"] for r in cdf if r["_change_type"] == "update_preimage"}
    post = {r["id"]: r["v"] for r in cdf if r["_change_type"] == "update_postimage"}
    assert pre == {i: float(i) for i in range(6)}
    assert post == {i: i + 0.5 for i in range(6)}
    # AddCDCFile actions carry partitionValues (pruning contract)
    log1 = open(
        os.path.join(tmp_table, "_delta_log", "00000000000000000001.json")
    ).read()
    cdc_actions = [
        json.loads(ln)["cdc"] for ln in log1.splitlines() if '"cdc"' in ln
    ]
    assert cdc_actions
    assert all(
        a["partitionValues"].get("part") in {"0", "1", "2"} for a in cdc_actions
    )


def test_fused_merge_upsert_counts_and_cdf(spark, tmp_table):
    write_deltalake(
        tmp_table,
        spark.range(0, 20).selectExpr("id", "cast(0 as long) AS v"),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable(tmp_table)
    src = spark.range(15, 25).selectExpr("id", "cast(9 as long) AS v")
    m = (
        t.merge(src, "t.id = s.id", source_alias="s", target_alias="t")
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute()
    )
    assert m["num_target_rows_updated"] == 5
    assert m["num_target_rows_inserted"] == 5
    got = {r["id"]: r["v"] for r in t.to_spark().collect()}
    assert len(got) == 25 and got[15] == 9 and got[24] == 9 and got[0] == 0
    cdf = t.load_cdf(starting_version=1, ending_version=1).collect()
    kinds = {}
    for r in cdf:
        kinds.setdefault(r["_change_type"], set()).add(r["id"])
    assert kinds["insert"] == set(range(20, 25))
    assert kinds["update_preimage"] == set(range(15, 20))
    assert kinds["update_postimage"] == set(range(15, 20))


def test_write_rules_fall_back_to_two_write_path(spark, tmp_table):
    """Tables with CHECK constraints keep the legacy path (validation
    stays scoped to the rows the data write commits) and stay correct."""
    write_deltalake(
        tmp_table,
        spark.range(0, 10).selectExpr("id", "cast(id as double) AS v"),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable(tmp_table)
    t.alter.add_constraint({"v_nonneg": "v >= 0"})
    from delta_rs_spark.log.snapshot import load_snapshot

    assert not can_fuse_cdc_write(load_snapshot(tmp_table))
    t.delete("id >= 8")
    assert {r["id"] for r in t.to_spark().collect()} == set(range(8))
    got = t.load_cdf(starting_version=2, ending_version=2).collect()
    assert {r["id"] for r in got if r["_change_type"] == "delete"} == {8, 9}


def test_fused_dv_update_pre_post_images(spark, tmp_table):
    """DV-mode UPDATE with CDF: one fused job writes the updated-row
    files and the pre/post change files; values and CDF rows match the
    legacy two-write semantics."""
    write_deltalake(
        tmp_table,
        spark.range(0, 50).selectExpr("id", "cast(id as double) AS v"),
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    t = DeltaTable(tmp_table)
    m = t.update({"v": "v * 10"}, predicate="id < 5")
    assert m["num_updated_rows"] == 5
    got = {r["id"]: r["v"] for r in t.to_spark().collect()}
    assert got[3] == 30.0 and got[10] == 10.0 and len(got) == 50
    cdf = t.load_cdf(starting_version=1, ending_version=1).collect()
    pre = {r["id"]: r["v"] for r in cdf if r["_change_type"] == "update_preimage"}
    post = {r["id"]: r["v"] for r in cdf if r["_change_type"] == "update_postimage"}
    assert pre == {i: float(i) for i in range(5)}
    assert post == {i: i * 10.0 for i in range(5)}


def test_drop_cached_intermediates_releases_plan_pins(spark):
    from delta_rs_spark.functions.text import source_mix
    from delta_rs_spark.session import drop_cached_intermediates

    drop_cached_intermediates(spark)
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x"), ("a", "y y")], "source string, text string"
    )
    source_mix(df).write.format("noop").mode("overwrite").save()
    jsc = spark.sparkContext._jsc
    assert jsc.getPersistentRDDs().size() > 0
    n = drop_cached_intermediates(spark)
    assert n > 0
    assert jsc.getPersistentRDDs().size() == 0


def test_rebalanced_writes_bound_output_file_count(spark, tmp_table, tmp_path):
    """r13 size-adaptive output partitioning: a mutation whose source is
    a PERSISTED many-partition frame must not emit one tiny file per
    cache partition (the merge used to replace 1 removed file with 33
    adds). Covers the fused CDF write, the plain merge write, and the
    ingest-style append."""
    df = spark.range(0, 2000).selectExpr("id AS k", "cast(id % 7 as double) AS v")
    write_deltalake(
        tmp_table, df, configuration={"delta.enableChangeDataFeed": "true"}
    )
    src = (
        spark.range(1000, 3000)
        .selectExpr("id AS k", "cast(-1 as double) AS v")
        .repartition(32)
        .persist()
    )
    src.count()
    try:
        m = (
            DeltaTable(tmp_table)
            .merge(src, "t.k = s.k", source_alias="s", target_alias="t")
            .when_matched_update({"v": "s.v"})
            .when_not_matched_insert({"k": "s.k", "v": "s.v"})
            .execute()
        )
    finally:
        src.unpersist()
    assert m["num_target_rows_updated"] == 1000
    assert m["num_target_files_added"] <= 4  # was 33 pre-rebalance
    assert len(_cdc_files(tmp_table)) <= 4

    # non-CDF branch (write_files path)
    t2 = str(tmp_path / "plain")
    write_deltalake(t2, df)
    src2 = spark.range(0, 500).selectExpr(
        "id AS k", "cast(-2 as double) AS v"
    ).repartition(32).persist()
    src2.count()
    try:
        m2 = (
            DeltaTable(t2)
            .merge(src2, "t.k = s.k", source_alias="s", target_alias="t")
            .when_matched_update({"v": "s.v"})
            .execute()
        )
    finally:
        src2.unpersist()
    assert m2["num_target_files_added"] <= 4
