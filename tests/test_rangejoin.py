import pytest
from pyspark.sql import functions as F

from delta_rs_spark.functions.rangejoin import interval_join


def _pairs(df):
    return sorted((r.lid, r.rid) for r in df.collect())


def test_interval_join_matches_naive_theta_join(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 25), (3, 40, 41), (4, 100, 100)],
        ["lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(10, 8, 12), (20, 24, 50), (30, 99, 101), (40, 200, 300)],
        ["rid", "rs", "re"],
    )
    got = _pairs(interval_join(left, right, "ls", "le", "rs", "re", bucket_width=7))
    want = _pairs(
        left.join(
            right,
            (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
            "inner",
        )
    )
    assert got == want and len(got) == 5


def test_interval_join_long_interval_no_duplicates(spark):
    # one pair overlapping dozens of shared buckets must appear exactly once
    left = spark.createDataFrame([(1, 0, 1000)], ["lid", "ls", "le"])
    right = spark.createDataFrame([(2, 500, 900)], ["rid", "rs", "re"])
    out = interval_join(left, right, "ls", "le", "rs", "re", bucket_width=10)
    assert out.count() == 1


def test_interval_join_rejects_shared_columns_and_bad_width(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "s", "e"])
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(df, df, "s", "e", "s", "e", bucket_width=5)
    right = spark.createDataFrame([(1, 2, 3)], ["b", "rs", "re"])
    with pytest.raises(ValueError, match="positive"):
        interval_join(df, right, "s", "e", "rs", "re", bucket_width=0)


def test_interval_join_plan_is_equi_join(spark):
    """The whole point: the physical plan must be a hash/sort-merge join
    keyed by bucket, never a nested-loop/cartesian product."""
    left = spark.range(100).select(
        F.col("id").alias("lid"),
        (F.col("id") * 10).alias("ls"),
        (F.col("id") * 10 + 5).alias("le"),
    )
    right = spark.range(50).select(
        F.col("id").alias("rid"),
        (F.col("id") * 20).alias("rs"),
        (F.col("id") * 20 + 3).alias("re"),
    )
    plan = (
        interval_join(left, right, "ls", "le", "rs", "re", bucket_width=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
