"""Structured Streaming integration for Delta tables.

The reference has no streaming engine — its streaming-adjacent surface
is CDF incremental reads (operations/load_cdf.rs), the StreamingUpdate
commit kind (protocol/mod.rs:316) and txn idempotency watermarks
(actions.rs:1042). Spark gives us the strict superset (SURVEY §2B):

* ``write_stream_to_delta`` — exactly-once Delta sink via foreachBatch:
  every micro-batch commits through the transaction log with
  ``txn_app_id = <query id>`` / ``txn_version = batch id``, so replayed
  batches after failure are no-ops (the same idempotency contract the
  reference implements for external writers).
* ``read_append_stream`` — tail an append-only Delta table as a
  streaming source (file-based; rewriting operators like UPDATE/MERGE
  require CDF-based following instead).
* ``CdfFollower`` — incremental micro-batch puller over the change feed:
  each ``poll()`` returns the CDF rows of commits since the last poll.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.commit import DeltaError


def write_stream_to_delta(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_location: str,
    app_id: str | None = None,
    mode: str = "append",
    partition_by: list[str] | None = None,
    trigger: dict[str, Any] | None = None,
) -> StreamingQuery:
    """Exactly-once streaming sink into a Delta table."""
    from delta_rs_spark.writer import write_deltalake

    app = app_id or f"stream-{checkpoint_location}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_deltalake(
            table_path,
            batch_df,
            mode="append" if mode == "append" else mode,
            partition_by=partition_by,
            txn_app_id=app,
            txn_version=batch_id,
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append" if mode == "append" else "update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def delta_sink_batch(table_path: str, app_id: str):
    """The bare foreachBatch callable, exposed for testing replay
    semantics without running a live stream."""
    from delta_rs_spark.writer import write_deltalake

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_deltalake(
            table_path, batch_df, mode="append", txn_app_id=app_id, txn_version=batch_id
        )

    return sink


def read_append_stream(spark: SparkSession, table_path: str) -> DataFrame:
    """Streaming source over an APPEND-ONLY Delta table (parquet file
    tailing with the table schema; partition columns come from dir
    layout). Raises if the log shows rewriting commits — those need
    the CDF follower."""
    snapshot = snap_mod.load_snapshot(table_path)
    if snapshot.tombstones:
        # any tombstone (even dataChange=false from OPTIMIZE) means removed
        # files still sit on disk until VACUUM and a file-tailing source
        # would read both generations
        raise DeltaError(
            "table has removed files; use CdfFollower for rewritten/compacted tables"
        )
    schema = T.StructType.fromJson(json.loads(snapshot.schema_string))
    reader = spark.readStream.schema(schema)
    if snapshot.partition_columns:
        reader = reader.option("basePath", table_path)
    return reader.option("pathGlobFilter", "*.parquet").parquet(table_path)


class CdfFollower:
    """Micro-batch change-feed puller: poll() -> DataFrame of changes
    committed since the previous poll (None when caught up)."""

    def __init__(self, spark: SparkSession, table_path: str, starting_version: int = 0):
        self.spark = spark
        self.table_path = table_path
        self.next_version = starting_version

    def poll(self) -> DataFrame | None:
        from delta_rs_spark.operators.cdf import load_cdf

        latest = snap_mod.latest_version(self.table_path)
        if latest is None or latest < self.next_version:
            return None
        df = load_cdf(
            self.spark,
            self.table_path,
            starting_version=self.next_version,
            ending_version=latest,
        )
        self.next_version = latest + 1
        return df
