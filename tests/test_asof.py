"""As-of join operator (functions/asof.py)."""

import datetime as dt

from pyspark.sql import functions as F

from delta_rs_spark.functions.asof import asof_join


def _frames(spark):
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=5), "c1"),
            (1, base + dt.timedelta(minutes=20), "c2"),
            (2, base + dt.timedelta(minutes=1), "c3"),
        ],
        "uid long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=0), 10.0),
            (1, base + dt.timedelta(minutes=10), 20.0),
            (2, base + dt.timedelta(minutes=1), 30.0),
        ],
        "uid long, ts timestamp, px double",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = {r.tag: r.r_px for r in asof_join(left, right, on="ts", by="uid").collect()}
    assert out == {"c1": 10.0, "c2": 20.0, "c3": 30.0}  # c3: exact match allowed


def test_asof_strict(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r.r_px
        for r in asof_join(
            left, right, on="ts", by="uid", allow_exact_matches=False
        ).collect()
    }
    assert out["c3"] is None  # equal timestamp excluded in strict mode
    assert out["c1"] == 10.0


def test_asof_no_prior_row_is_null(spark):
    left, right = _frames(spark)
    early = spark.createDataFrame(
        [(1, dt.datetime(2023, 12, 31), "c0")], "uid long, ts timestamp, tag string"
    )
    out = asof_join(early, right, on="ts", by="uid").collect()
    assert out[0].r_px is None
