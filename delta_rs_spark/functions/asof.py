"""As-of join — the classic time-series operator Spark lacks natively.

``asof_join(left, right, on, by)`` attaches, to every left row, the most
recent right row with ``right.on <= left.on`` within the same ``by``
group (backward as-of; the DuckDB/pandas/kdb semantics).

Implementation is the union-marker trick, fully shuffle-native (no
Python): union both sides with a side marker, one window sorted by
(time, marker) per ``by`` group, ``last(right value, ignorenulls)``
carries the latest right payload forward onto left rows. Exactly one
shuffle on the ``by`` key — the same cost as a regular grouped window,
no range-bucketing approximation, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (sorts first on ties), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_prefix: str = "r_",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join. Right columns (except join keys) are attached
    with ``right_prefix``. ``allow_exact_matches=False`` requires
    ``right.on < left.on`` strictly."""
    by = [by] if isinstance(by, str) else (by or [])
    keys = [*by, on]
    rpayload = [c for c in right.columns if c not in keys]

    lmark = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(right_prefix + c) for c in rpayload],
    )
    rmark = right.select(
        *[F.col(c) for c in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(right_prefix + c) for c in rpayload],
    ).select(*lmark.columns)  # align column order

    unioned = lmark.unionByName(rmark)
    # ties: with exact matches the right row sorts BEFORE the left row at
    # equal timestamps (marker 0 < 1); strict mode flips the tiebreak.
    tie = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), tie)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col(_SIDE),
        *[
            F.last(right_prefix + c, ignorenulls=True).over(w).alias(right_prefix + c)
            for c in rpayload
        ],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
