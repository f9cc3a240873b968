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
        self._registered_version: dict[str, int] = {}

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
        self._registered_version.pop(table_name, None)
        return self

    def execute(self, sql: str) -> DataFrame:
        """Run SQL over the registered tables; returns a lazy DataFrame
        (the reference returns a RecordBatchReader — same pull semantics).

        A view is (re)created only when its handle's snapshot version
        changed since the last execute (registration, mutation through
        the handle, update_incremental) — per-execute work is O(changed
        tables), not O(tables), without serving stale file lists."""
        for name, dt in self._tables.items():
            v = dt.version()
            if self._registered_version.get(name) != v:
                dt.to_df().createOrReplaceTempView(name)
                self._registered_version[name] = v
        return self.spark.sql(sql)
