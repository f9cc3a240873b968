"""Bucketized interval-overlap (range) join.

Spark has no native interval join: the naive formulation
``l.join(r, (l.start <= r.end) & (r.start <= l.end))`` is a theta join
that Catalyst executes as BroadcastNestedLoopJoin (or a cartesian
product when neither side broadcasts) — O(|L|·|R|), hopeless at 100 TB.

The standard scale-out strategy (same shape Flink's interval join and
the classic spatial grid join use): quantize time into fixed-width
buckets, explode every interval into the buckets it covers, and
equi-join on the bucket key — Catalyst then plans an ordinary shuffled
hash join keyed by bucket, which partitions and scales like any
aggregation. A pair overlapping k shared buckets would surface k times,
so the join keeps only the bucket that contains the overlap's start
(``floor(max(l.start, r.start) / width)``) — every overlapping pair
appears in exactly that one bucket, which both dedups without a
DISTINCT shuffle AND skips the residual comparison in all other
buckets.

Bucket width tunes the cost triangle: per-row fanout is
``interval_length / width`` (explode cost), while candidate density per
bucket grows with ``width``. Pick width ~ the typical interval length;
heavily skewed buckets (one hot hour) are ordinary join skew — AQE's
skew-join splitting applies because the join IS an equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: int) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of ``left`` and ``right`` on interval overlap
    ``[left_start, left_end] ∩ [right_start, right_end] != ∅`` (closed
    intervals, integer units — epoch seconds, positions, ids).

    Column names of the two sides must be disjoint (rename before
    joining); the result carries all columns of both sides, one row per
    overlapping pair.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(
            f"interval_join requires disjoint column names; shared: {sorted(dup)}"
        )
    ls, le = F.col(left_start), F.col(left_end)
    rs, re = F.col(right_start), F.col(right_end)

    lb = left.withColumn(
        "__lb",
        F.explode(F.sequence(_bucket(ls, bucket_width), _bucket(le, bucket_width))),
    )
    rb = right.withColumn(
        "__rb",
        F.explode(F.sequence(_bucket(rs, bucket_width), _bucket(re, bucket_width))),
    )
    cond = (
        (F.col("__lb") == F.col("__rb"))
        # overlap test, evaluated only inside the shared bucket
        & (ls <= re)
        & (rs <= le)
        # keep exactly the bucket containing the overlap's start: each
        # overlapping pair survives in ONE bucket -> no dedup shuffle
        & (F.col("__lb") == _bucket(F.greatest(ls, rs), bucket_width))
    )
    return lb.join(rb, cond, "inner").drop("__lb", "__rb")
