"""r12 merge internals: num_source_rows rides the early-filter
aggregation when that pass is complete, and falls back to a cached
count otherwise; the duplicate-match validation and winner counts are
one aggregation. These tests pin the METRIC VALUES through every
branch so the fusion can never drift them."""

import pytest

from delta_rs_spark import DeltaTable, write_deltalake


@pytest.fixture()
def target(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(20).selectExpr("id", "id % 4 AS part", "id * 10 AS v")
    write_deltalake(path, df, partition_by=["part"])
    return path


def _merge(spark, path, source):
    return (
        DeltaTable(path, spark=spark)
        .merge(source, "t.id = s.id", source_alias="s", target_alias="t")
        .when_matched_update({"v": "s.v"})
        .when_not_matched_insert({"id": "s.id", "part": "s.part", "v": "s.v"})
        .execute()
    )


def test_source_count_from_grouped_early_filter(spark, target):
    # equi-join includes the partition column? it does not — the join
    # is on id (a stats column), so the GLOBAL min/max agg runs and
    # carries the count
    src = spark.range(5, 12).selectExpr("id", "id % 4 AS part", "id * 100 AS v")
    m = _merge(spark, target, src)
    assert m["num_source_rows"] == 7
    assert m["num_target_rows_updated"] == 7
    assert m["num_target_rows_inserted"] == 0


def test_source_count_on_partition_join(spark, tmp_path):
    # join ON the partition column -> the grouped (partition-IN) agg
    # path computes the count from per-group sums
    path = str(tmp_path / "p")
    df = spark.range(12).selectExpr("id % 3 AS part", "id AS v")
    write_deltalake(path, df, partition_by=["part"])
    src = spark.range(2).selectExpr("id AS part", "id + 1000 AS v")
    m = (
        DeltaTable(path, spark=spark)
        .merge(src, "t.part = s.part", source_alias="s", target_alias="t")
        .when_matched_update({"v": "s.v"})
        .execute()
    )
    assert m["num_source_rows"] == 2
    # 2 source parts x 4 target rows each, every matched row updated
    assert m["num_target_rows_updated"] == 8


def test_source_count_fallback_without_equi_pairs(spark, target):
    # a predicate with no target=source equi pair -> _strip returns
    # early with no aggregation; the fallback cached count must serve
    src = spark.range(3).selectExpr(
        "id + 100 AS id", "id % 4 AS part", "id AS v"
    )
    m = (
        DeltaTable(target, spark=spark)
        .merge(src, "t.id > s.id + 1000", source_alias="s", target_alias="t")
        .when_matched_update({"v": "s.v"})
        .when_not_matched_insert({"id": "s.id", "part": "s.part", "v": "s.v"})
        .execute()
    )
    assert m["num_source_rows"] == 3
    assert m["num_target_rows_inserted"] == 3


def test_duplicate_match_validation_still_raises(spark, target):
    from delta_rs_spark.operators.merge import MergeError

    dup = spark.createDataFrame(
        [(5, 1, 1), (5, 1, 2)], "id long, part long, v long"
    )
    with pytest.raises(MergeError):
        _merge(spark, target, dup)


def test_insert_anti_join_scans_only_touched_files(spark, tmp_path, monkeypatch):
    """r12: with matched clauses (and no not-matched-by-source), the
    insert path's anti-join reads only the TOUCHED files — every match
    pair lives in a touched file by definition — while insert-only and
    nmbs merges keep the candidate fallback. Instrument read_snapshot_df
    to record the file set each caller passes."""
    import delta_rs_spark.table as table_mod

    path = str(tmp_path / "scan")
    # 4 single-file commits -> 4 files with disjoint id ranges
    for lo in (0, 100, 200, 300):
        write_deltalake(
            path,
            spark.range(lo, lo + 100).selectExpr("id", "id AS v").coalesce(1),
            mode="append" if lo else "error",
        )
    dt = DeltaTable(path, spark=spark)
    assert len(dt.files()) == 4

    calls = []
    real = table_mod.read_snapshot_df

    def spy(spark_, snapshot, table_path, **kw):
        calls.append(kw.get("files"))
        return real(spark_, snapshot, table_path, **kw)

    # merge.execute() imports read_snapshot_df from the table module at
    # call time, so patching the table module intercepts every scan
    monkeypatch.setattr(table_mod, "read_snapshot_df", spy)

    src = spark.createDataFrame(
        [(150, 1), (900, 9)], "id long, v long"
    )  # one match (file 2), one insert
    m = (
        dt.merge(src, "t.id = s.id", source_alias="s", target_alias="t")
        .when_matched_update({"v": "s.v"})
        .when_not_matched_insert({"id": "s.id", "v": "s.v"})
        .execute()
    )
    assert m["num_target_rows_updated"] == 1
    assert m["num_target_rows_inserted"] == 1
    assert m["num_target_files_removed"] == 1
    # r13: the insert anti-join reads the persisted rewrite-join frame,
    # not the files — calls: [discovery candidates, rewrite touched]
    assert len(calls) == 2, "insert anti-join must not re-scan files"
    assert len(calls[1]) == 1, "rewrite must scan only touched files"

    # insert-only merge: no discovery -> anti-join scans the candidates
    calls.clear()
    m2 = (
        DeltaTable(path, spark=spark)
        .merge(
            spark.createDataFrame([(150, 5), (950, 5)], "id long, v long"),
            "t.id = s.id",
            source_alias="s",
            target_alias="t",
        )
        .when_not_matched_insert({"id": "s.id", "v": "s.v"})
        .execute()
    )
    assert m2["num_target_rows_inserted"] == 1  # 150 matches, must not insert
    assert len(calls) == 1 and len(calls[0]) >= 1  # candidates, not []
