"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All query implementations live in ``delta_rs_spark``; this module only
assembles the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing these modules populates the shared query registry.
import delta_rs_spark.queries  # noqa: F401  (relational plane)
import delta_rs_spark.queries_llm  # noqa: F401  (dedup/similarity/text/multimodal)
import delta_rs_spark.queries_streaming  # noqa: F401  (window operators, batch replay)
import delta_rs_spark.queries_delta  # noqa: F401  (Delta table operations, SURVEY §2A)

from delta_rs_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from delta_rs_spark.queries import q1

    return q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in registry().items()
        if oracle is not None
    }
