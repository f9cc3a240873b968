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
