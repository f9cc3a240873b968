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
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.commit import DeltaError
from delta_rs_spark.operators.util import resolve_add_path


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


try:
    from pyspark.sql.datasource import InputPartition as _InputPartition
except ImportError:  # pragma: no cover - pyspark < 4
    _InputPartition = object


class _AddFilePartition(_InputPartition):
    """One committed data file to read in a micro-batch (pickled to the
    Python worker that executes ``read``)."""

    def __init__(
        self,
        abs_path: str,
        partition_values: dict,
        schema_json: str,
        dead_rows: tuple = (),
    ):
        self.abs_path = abs_path
        self.partition_values = partition_values
        self.schema_json = schema_json
        # deletion-vector row indexes (file positions) to drop at read
        # time — the file's LOGICAL content excludes them
        self.dead_rows = dead_rows


def _make_stream_reader_cls():
    """Build the DataSource classes lazily (pyspark.sql.datasource import)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _DeltaLogStreamReader(DataSourceStreamReader):
        """Micro-batch reader driven by the TRANSACTION LOG, not directory
        listing: an offset is a committed table version, a batch is the
        data_change Add files of versions (start, end]. Files from
        in-flight, conflicted, or failed writes (which sit in the table
        dir before their commit succeeds) are invisible — only paths the
        log committed are ever read. Rewriting commits (Remove with
        dataChange=true, e.g. UPDATE/MERGE/DELETE) raise mid-stream
        unless ignoreChanges is set; OPTIMIZE's dataChange=false
        shuffles are skipped entirely instead of being re-emitted.
        """

        def __init__(
            self,
            table_path: str,
            schema_json: str,
            ignore_changes: bool,
            starting_version: int | None = None,
            max_files_per_trigger: int | None = None,
            max_bytes_per_trigger: int | None = None,
        ):
            self.table_path = table_path
            self.schema_json = schema_json
            self.ignore_changes = ignore_changes
            self.starting_version = starting_version
            self.max_files = max_files_per_trigger
            self.max_bytes = max_bytes_per_trigger
            # last batch-end version handed to partitions(); drives the
            # maxFilesPerTrigger cap. Seeded from startingVersion when
            # given (so the catch-up tail is capped from the very first
            # batch); otherwise None until the first batch (the initial
            # snapshot is uncapped by design, and the first post-restart
            # batch is uncapped — the same best-effort delta-spark
            # documents for its limits)
            self._prev: int | None = (
                starting_version - 1 if starting_version is not None else None
            )

        def initialOffset(self) -> dict:
            # startingVersion=N: tail from version N on, NO initial
            # snapshot (delta-spark source semantics); default -1 means
            # first batch = full current snapshot, then tail
            if self.starting_version is not None:
                return {"version": self.starting_version - 1}
            return {"version": -1}

        def latestOffset(self) -> dict:
            latest = snap_mod.latest_version(self.table_path)
            if latest is None:
                return {"version": -1}
            if (self.max_files is None and self.max_bytes is None) or (
                self._prev is None
            ):
                return {"version": latest}
            # rate limit: advance until the cumulative data-change add
            # count would exceed maxFilesPerTrigger, or their bytes
            # maxBytesPerTrigger — whichever is hit first when both are
            # set (always >= 1 version so the stream cannot stall)
            end = self._prev
            n = 0
            nb = 0
            for v in range(self._prev + 1, latest + 1):
                try:
                    actions = snap_mod.read_commit_actions(self.table_path, v)
                except FileNotFoundError:
                    end = v  # partitions() raises the precise error
                    break
                from delta_rs_spark.log.actions import Add as _Add

                dc = [a for a in actions if isinstance(a, _Add) and a.data_change]
                adds = len(dc)
                bytes_ = sum(a.size for a in dc)
                over_files = self.max_files is not None and n + adds > self.max_files
                over_bytes = self.max_bytes is not None and nb + bytes_ > self.max_bytes
                if n and (over_files or over_bytes):
                    break
                n += adds
                nb += bytes_
                end = v
            return {"version": end}

        def partitions(self, start: dict, end: dict):
            from delta_rs_spark.log.actions import Add, Remove

            self._prev = end["version"]
            parts = []
            if start["version"] < 0 and self.starting_version is None:
                # FRESH stream: first batch = the full snapshot at `end`
                # (initial-snapshot-then-tail, the semantics delta-spark's
                # source defaults to) — works even when early commit JSONs
                # were already checkpointed away
                snap = snap_mod.load_snapshot(self.table_path, end["version"])
                for a in snap.files.values():
                    parts.append(
                        _AddFilePartition(
                            resolve_add_path(self.table_path, a.path),
                            dict(a.partition_values or {}),
                            self.schema_json,
                            dead_rows=self._dead_rows(a),
                        )
                    )
                from pyspark.sql.datasource import InputPartition

                return parts or [InputPartition(0)]
            for v in range(start["version"] + 1, end["version"] + 1):
                try:
                    actions = snap_mod.read_commit_actions(self.table_path, v)
                except FileNotFoundError:
                    # an ESTABLISHED stream lagging past metadata cleanup:
                    # silently skipping would drop the version's rows and
                    # break exactly-once — fail loudly
                    raise DeltaError(
                        f"commit {v} was cleaned up before the stream "
                        "consumed it (delta.logRetentionDuration); restart "
                        "the stream to resume from a fresh snapshot"
                    ) from None
                if not self.ignore_changes and any(
                    isinstance(a, Remove) and a.data_change for a in actions
                ):
                    raise DeltaError(
                        f"version {v} rewrites data (UPDATE/MERGE/DELETE); "
                        "use CdfFollower or ignore_changes=True"
                    )
                for a in actions:
                    if isinstance(a, Add) and a.data_change:
                        parts.append(
                            _AddFilePartition(
                                resolve_add_path(self.table_path, a.path),
                                dict(a.partition_values or {}),
                                self.schema_json,
                                dead_rows=self._dead_rows(a),
                            )
                        )
            return parts or [InputPartition(0)]

        def _dead_rows(self, add) -> tuple:
            """A DV'd add's logical content excludes its deletion-vector
            rows — decode once driver-side (memoized) so the re-emitted
            file (initial snapshot, or ignore_changes tail) never
            resurrects soft-deleted rows."""
            if not add.deletion_vector:
                return ()
            from delta_rs_spark.plans.deletion_vectors import (
                load_dv_row_indexes,
            )

            return tuple(load_dv_row_indexes(self.table_path, add.deletion_vector))

        def read(self, partition):
            if not isinstance(partition, _AddFilePartition):
                return  # empty placeholder batch
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema

            spark_schema = T.StructType.fromJson(json.loads(partition.schema_json))
            arrow_schema = to_arrow_schema(spark_schema)
            tbl = pq.read_table(partition.abs_path)
            if partition.dead_rows:
                import numpy as np

                mask = np.ones(len(tbl), dtype=bool)
                mask[np.asarray(partition.dead_rows, dtype=np.int64)] = False
                tbl = tbl.filter(pa.array(mask))
            n = len(tbl)
            cols = []
            for f in arrow_schema:
                if f.name in tbl.column_names:
                    cols.append(tbl[f.name].cast(f.type))
                else:
                    raw = partition.partition_values.get(f.name)
                    if raw is None:
                        cols.append(pa.nulls(n, f.type))
                    else:
                        cols.append(pa.array([raw] * n).cast(f.type))
            out = pa.table(cols, schema=arrow_schema)
            for batch in out.to_batches():
                yield batch

        def commit(self, end: dict) -> None:
            pass

    class DeltaLogStreamDataSource(DataSource):
        """``spark.readStream.format("delta_log_stream")`` source."""

        @classmethod
        def name(cls) -> str:
            return "delta_log_stream"

        def schema(self):
            snapshot = snap_mod.load_snapshot(self.options["path"])
            return T.StructType.fromJson(json.loads(snapshot.schema_string))

        def streamReader(self, schema):
            snapshot = snap_mod.load_snapshot(self.options["path"])
            ignore = str(self.options.get("ignorechanges", "false")).lower() == "true"
            sv = self.options.get("startingversion")
            mf = self.options.get("maxfilespertrigger")
            mb = self.options.get("maxbytespertrigger")
            return _DeltaLogStreamReader(
                self.options["path"],
                snapshot.schema_string,
                ignore,
                starting_version=int(sv) if sv is not None else None,
                max_files_per_trigger=int(mf) if mf is not None else None,
                max_bytes_per_trigger=int(mb) if mb is not None else None,
            )

    return DeltaLogStreamDataSource


def read_append_stream(
    spark: SparkSession,
    table_path: str,
    ignore_changes: bool = False,
    starting_version: int | None = None,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over an append-only Delta table, driven by the
    transaction log (only committed Add paths are read — never staged,
    conflicted, or orphaned files). Raises up front if the log already
    shows rewriting commits, and the source itself re-checks every new
    commit mid-stream."""
    snapshot = snap_mod.load_snapshot(table_path)
    # historical DV soft mutations are fine: their tombstoned paths are
    # still live (re-added with a descriptor) and the source applies the
    # DV at read time; a tombstone whose path truly left the table means
    # a rewriting writer, which file-level streaming can't represent
    live = set(snapshot.files)
    if not ignore_changes and any(
        t.data_change and t.path not in live for t in snapshot.tombstones
    ):
        raise DeltaError(
            "table has rewritten files; use CdfFollower or ignore_changes=True"
        )
    spark.dataSource.register(_make_stream_reader_cls())
    reader = (
        spark.readStream.format("delta_log_stream")
        .option("path", table_path)
        .option("ignoreChanges", str(ignore_changes).lower())
    )
    if starting_version is not None:
        # tail from this version on (no initial snapshot), delta-spark's
        # startingVersion semantics
        reader = reader.option("startingVersion", str(starting_version))
    if max_files_per_trigger is not None:
        # cap data-change add files per micro-batch (delta-spark's
        # maxFilesPerTrigger) — at 100 TB an unthrottled catch-up batch
        # is the difference between a stream and an accidental full scan
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if max_bytes_per_trigger is not None:
        # soft byte cap per micro-batch (delta-spark's maxBytesPerTrigger):
        # a batch takes whole commits until the cumulative data-change add
        # bytes would exceed the cap; when both limits are set, whichever
        # is hit first ends the batch
        reader = reader.option("maxBytesPerTrigger", str(max_bytes_per_trigger))
    return reader.load()


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


def delta_upsert_batch(table_path: str, keys: list[str], app_id: str):
    """foreachBatch callable for an exactly-once streaming UPSERT sink:
    each micro-batch MERGEs into the table on ``keys`` (matched rows
    update, new rows insert), with the (app_id, batch_id) idempotency
    watermark committed ATOMICALLY with the merge via
    ``CommitProperties.app_transactions`` — a replayed batch after
    recovery sees its own watermark and no-ops, the same contract the
    append sink gets from write_deltalake's txn args. In-batch key
    duplicates collapse via dropDuplicates first (a MERGE source must
    match each target row at most once)."""
    from delta_rs_spark.properties import CommitProperties
    from delta_rs_spark.table import DeltaTable
    from delta_rs_spark.writer import write_deltalake

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        deduped = batch_df.dropDuplicates(keys)
        if not DeltaTable.is_deltatable(table_path):
            write_deltalake(
                table_path,
                deduped,
                mode="append",
                txn_app_id=app_id,
                txn_version=batch_id,
            )
            return
        t = DeltaTable(table_path, spark=batch_df.sparkSession)
        last = t.transaction_version(app_id)
        if last is not None and batch_id <= last:
            return  # replayed micro-batch: already applied
        cond = " AND ".join(f"target.{k} = source.{k}" for k in keys)
        (
            t.merge(
                deduped,
                cond,
                source_alias="source",
                target_alias="target",
                commit_properties=CommitProperties(
                    app_transactions=[(app_id, batch_id)]
                ),
            )
            .when_matched_update_all()
            .when_not_matched_insert_all()
            .execute()
        )

    return sink


def write_stream_upsert_to_delta(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint_location: str,
    app_id: str | None = None,
    trigger: dict[str, Any] | None = None,
) -> StreamingQuery:
    """Exactly-once streaming upsert (merge) sink — the streaming CDC
    apply pattern: dedup each micro-batch by key, MERGE into the target,
    watermark atomically. Use over ``write_stream_to_delta`` when the
    stream carries updates to existing keys rather than pure appends."""
    app = app_id or f"upsert-{checkpoint_location}"
    writer = (
        stream_df.writeStream.foreachBatch(delta_upsert_batch(table_path, keys, app))
        .option("checkpointLocation", checkpoint_location)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
