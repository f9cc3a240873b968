"""QueryBuilder — SQL over registered Delta tables.

(reference: python/deltalake/query.py:13-53 -> python/src/query.rs:22-73;
execution there is DataFusion SQL, here it is Spark SQL — same plane.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_rs_spark.table import DeltaTable


class QueryBuilder:
    def __init__(self, spark: SparkSession | None = None):
        self._spark = spark
        self._tables: dict[str, DeltaTable] = {}
        self._dirty: set[str] = set()

    @property
    def spark(self) -> SparkSession:
        if self._spark is not None:
            return self._spark
        s = SparkSession.getActiveSession()
        if s is None:
            from delta_rs_spark.session import get_spark

            s = get_spark()
        return s

    def register(self, table_name: str, delta_table: DeltaTable) -> "QueryBuilder":
        self._tables[table_name] = delta_table
        self._dirty.add(table_name)
        return self

    def execute(self, sql: str) -> DataFrame:
        """Run SQL over the registered tables; returns a lazy DataFrame
        (the reference returns a RecordBatchReader — same pull semantics).

        Views are (re)created only for tables registered since the last
        execute — per-execute work stays O(new tables), not O(tables).
        A handle refreshed via ``update_incremental`` can be re-bound by
        calling ``register`` again."""
        for name in self._dirty:
            self._tables[name].to_df().createOrReplaceTempView(name)
        self._dirty.clear()
        return self.spark.sql(sql)
