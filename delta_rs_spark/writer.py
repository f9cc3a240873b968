"""write_deltalake — append / overwrite / replaceWhere writes.

API mirrors the reference's writer surface
(reference: python/deltalake/writer/writer.py:66-168) but the data plane
is Spark: the DataFrame is written with Spark's parallel parquet writer
into a staging directory (Hive ``k=v`` layout via ``partitionBy`` —
exactly the layout the Delta protocol encodes in Add.path), files are
moved into the table root, per-file stats are collected from parquet
footers only (no data re-read; reference: crates/core/src/writer/stats.rs),
and a single transaction commits the Add/Remove actions.

Scale notes: the write itself is fully distributed (Spark tasks write
files in parallel); only footer-stat collection and the log commit run
on the driver, both O(num files). Partitioned writes hash-repartition by
the partition columns first (reference: write/execution.rs:655-678) so
each partition is produced by few tasks instead of every task writing a
sliver of every partition.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_rs_spark.log import commit as commit_mod
from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.actions import Add, CommitInfo, Metadata, Remove, Txn, now_ms
from delta_rs_spark.log.commit import DeltaError, TransactionInfo
from delta_rs_spark.log.stats import collect_stats_parallel, stats_config, stats_json
from delta_rs_spark.operators.util import local_table_path

_NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"


class TableExistsError(DeltaError):
    pass


class SchemaMismatchError(DeltaError):
    pass


def _signed_arrow_type(t):
    """Delta has no unsigned types: map uintN -> intN at the SAME width
    (the reference's arrow ingest does exactly this, and its safe cast
    errors on overflow — python/tests/test_casting.py pins uint8 value
    200 refusing to become an Int8). Recurses into nested types."""
    import pyarrow as pa

    if pa.types.is_uint8(t):
        return pa.int8()
    if pa.types.is_uint16(t):
        return pa.int16()
    if pa.types.is_uint32(t):
        return pa.int32()
    if pa.types.is_uint64(t):
        return pa.int64()
    if pa.types.is_list(t):
        return pa.list_(_signed_arrow_type(t.value_type))
    if pa.types.is_large_list(t):
        return pa.large_list(_signed_arrow_type(t.value_type))
    if pa.types.is_map(t):
        return pa.map_(_signed_arrow_type(t.key_type), _signed_arrow_type(t.item_type))
    if pa.types.is_struct(t):
        return pa.struct(
            [pa.field(f.name, _signed_arrow_type(f.type), f.nullable) for f in t]
        )
    return t


def _ingest_arrow(table, spark: SparkSession) -> DataFrame:
    """Arrow table -> Spark, preserving integer widths (int8 -> ByteType
    etc. — the to_pandas round-trip used to widen everything to LONG).
    Unsigned columns are overflow-checked into same-width signed."""
    import pyarrow as pa

    signed = pa.schema(
        [
            pa.field(f.name, _signed_arrow_type(f.type), f.nullable)
            for f in table.schema
        ]
    )
    if signed != table.schema:
        try:
            table = table.cast(signed)  # safe: raises on overflow
        except pa.lib.ArrowInvalid as e:
            raise DeltaError(f"Cast error: {e}") from e
    try:
        return spark.createDataFrame(table)
    except Exception:
        # older Spark without direct-arrow createDataFrame
        return spark.createDataFrame(table.to_pandas())


def _to_spark_df(data: Any, spark: SparkSession | None) -> DataFrame:
    if isinstance(data, DataFrame):
        return data
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise DeltaError("a SparkSession is required to convert non-Spark input")
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            return spark.createDataFrame(data)
    except ImportError:
        pass
    try:
        import pyarrow as pa

        if isinstance(data, pa.RecordBatch):
            data = pa.Table.from_batches([data])
        if isinstance(data, pa.RecordBatchReader):
            data = data.read_all()
        if isinstance(data, pa.Table):
            return _ingest_arrow(data, spark)
    except ImportError:
        pass
    return spark.createDataFrame(data)


def _decode_partition_dir(name: str) -> tuple[str, str | None]:
    k, _, v = name.partition("=")
    if v == _NULL_PARTITION:
        return k, None
    return k, urllib.parse.unquote(v)


def _encode_partition_value(v: str | None) -> str:
    if v is None:
        return _NULL_PARTITION
    return urllib.parse.quote(str(v), safe="")


def _spark_stats_fallback(
    df: DataFrame,
    moved: list,
    stats: list,
    num_indexed_cols: int,
    stats_columns: list[str] | None,
    partition_by: list[str] | None = None,
) -> list:
    """Per-file Delta stats via one Spark aggregation, for files whose
    parquet footer pyarrow cannot parse (VARIANT logical type). Same
    contract as log.stats.collect_file_stats: numRecords + min/max/
    nullCount for the first-N (or name-selected) TOP-LEVEL columns;
    variant/nested/binary columns carry no min/max (they do not in
    footer stats either). One scan of only the affected files, grouped
    by _metadata.file_path — no driver-side row materialization beyond
    |files| stat rows."""
    from delta_rs_spark.log.stats import _scalar

    spark = df.sparkSession
    todo = [i for i, st in enumerate(stats) if st is None]
    paths = [moved[i][0] for i in todo]

    # partition columns are directory-encoded, not stored in the files;
    # the per-path scan below sees only physical columns (matching
    # collect_file_stats, which stats footer columns only)
    part = set(partition_by or ())
    fields = [f for f in df.schema.fields if f.name not in part]
    if stats_columns is not None:
        eligible = [f for f in fields if f.name in set(stats_columns)]
    elif num_indexed_cols < 0:
        eligible = list(fields)
    else:
        eligible = list(fields[:num_indexed_cols])
    atomic = (
        T.NumericType, T.StringType, T.DateType, T.TimestampType,
        T.TimestampNTZType, T.BooleanType,
    )
    stat_fields = [f for f in eligible if isinstance(f.dataType, atomic)]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, f in enumerate(stat_fields):
        c = F.col(f"`{f.name}`")
        aggs.append(F.min(c).alias(f"__mn{i}"))
        aggs.append(F.max(c).alias(f"__mx{i}"))
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"__nc{i}"))
    rows = (
        spark.read.parquet(*paths)
        .groupBy(F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("__file"))
        .agg(*aggs)
        .collect()
    )
    by_name = {}
    for r in rows:
        d = r.asDict()
        st = {
            "numRecords": int(d["__n"]),
            "minValues": {},
            "maxValues": {},
            "nullCount": {},
        }
        for i, f in enumerate(stat_fields):
            mn, mx = _scalar(d[f"__mn{i}"]), _scalar(d[f"__mx{i}"])
            if mn is not None:
                st["minValues"][f.name] = mn
            if mx is not None:
                st["maxValues"][f.name] = mx
            st["nullCount"][f.name] = int(d[f"__nc{i}"] or 0)
        by_name[d["__file"]] = st
    out = list(stats)
    for i in todo:
        out[i] = by_name.get(os.path.basename(moved[i][0]))
    return out


def _estimate_rows_for_bytes(df: DataFrame, target_bytes: int) -> int:
    """Rows per file that land near ``target_bytes`` on disk: serialize a
    bounded driver-side sample to an in-memory parquet buffer and scale.
    The sample is <= 1024 rows regardless of table size."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    sample = df.limit(1024).toPandas()
    if sample.empty:
        return 0
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(sample), buf, compression="snappy")
    bytes_per_row = max(buf.tell() / len(sample), 1.0)
    return max(int(target_bytes / bytes_per_row), 1)


def write_files(
    df: DataFrame,
    table_path: str,
    partition_by: list[str],
    max_records_per_file: int | None = None,
    writer_properties=None,
    target_file_size: int | None = None,
    configuration: dict[str, str] | None = None,
    table_schema_json: str | None = None,
    preserve_layout: bool = False,
) -> list[Add]:
    """Write df as parquet files into the table directory; return Adds.

    ``target_file_size`` (bytes — reference write_deltalake arg) is
    honored via maxRecordsPerFile with a sampled bytes/row estimate;
    ``writer_properties`` maps onto Spark parquet writer options
    (see properties.WriterProperties.spark_write_options)."""
    from delta_rs_spark.plans import column_mapping as cmap

    # resolve table config up front: column-mapped tables write PHYSICAL
    # column names into parquet, partition dirs, and (via the footers)
    # stats keys — every writer (append, delete/update/merge rewrites,
    # optimize) flows through here, so the rename happens exactly once
    cfg = configuration
    table_schema = table_schema_json
    if table_schema is None or cfg is None:
        try:
            from delta_rs_spark.log import snapshot as _snap0

            if _snap0.is_delta_table(table_path):
                _s = _snap0.load_snapshot(table_path)
                if cfg is None:
                    cfg = _s.configuration
                if table_schema is None:
                    table_schema = _s.schema_string
        except Exception:
            pass
    if cmap.mapping_mode(cfg or {}) != "none" and table_schema is not None:
        import json as _json

        schema = T.StructType.fromJson(_json.loads(table_schema))
        _extra = [
            c for c in df.columns if c not in {f.name for f in schema.fields}
        ]  # hidden physical columns (row tracking materialization)
        df = cmap.rename_to_physical(df, schema, extra_cols=_extra)
        phys = cmap.logical_to_physical(schema)
        partition_by = [phys.get(c, c) for c in partition_by]

    stage = os.path.join(table_path, f"_staging_{uuid.uuid4().hex}")
    writer = df
    if partition_by and not preserve_layout:
        # co-locate rows of one partition into few tasks (map-side file count
        # control; at cluster scale this is the difference between
        # tasks*partitions files and ~partitions files). preserve_layout
        # callers (z-order) arranged their own partitioning+sort — a hash
        # repartition here would destroy the clustering they just built.
        writer = df.repartition(*partition_by)
    w = writer.write.mode("overwrite")
    if target_file_size and not max_records_per_file:
        max_records_per_file = _estimate_rows_for_bytes(df, target_file_size)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if writer_properties is not None:
        for k, v in writer_properties.spark_write_options().items():
            w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage)

    adds: list[Add] = []
    moved: list[tuple[str, str, dict[str, str | None]]] = []  # (abs, rel, partvals)
    for root, _dirs, files in os.walk(stage):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            src = os.path.join(root, fn)
            rel_dir = os.path.relpath(root, stage)
            part_vals: dict[str, str | None] = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, v = _decode_partition_dir(seg)
                    part_vals[k] = v
            new_name = f"part-{uuid.uuid4().hex}.snappy.parquet"
            dst_dir = os.path.join(table_path, rel_dir) if rel_dir != "." else table_path
            os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, new_name)
            os.rename(src, dst)
            rel_path = os.path.relpath(dst, table_path)
            moved.append((dst, rel_path, part_vals))
    shutil.rmtree(stage, ignore_errors=True)

    # data-skipping stats knobs come from the same resolved configuration;
    # under column mapping the name-based selection is translated to the
    # physical names the footers carry
    n_idx, stats_cols = stats_config(cfg)
    if stats_cols and cmap.mapping_mode(cfg or {}) != "none" and table_schema is not None:
        import json as _json

        schema = T.StructType.fromJson(_json.loads(table_schema))
        phys = cmap.logical_to_physical(schema)
        stats_cols = [phys.get(c, c) for c in stats_cols]
    stats = collect_stats_parallel([m[0] for m in moved], n_idx, stats_cols)
    if any(st is None for st in stats):
        # pyarrow could not read some footers (VARIANT logical type):
        # compute the same stats with ONE Spark aggregation over just
        # those files — Spark reads its own variant output fine
        stats = _spark_stats_fallback(
            df, moved, stats, n_idx, stats_cols, partition_by
        )
    # row tracking's hidden materialized columns are physical-only —
    # keep them out of the skipping stats (they are not queryable).
    # Resolve the CONFIGURED names (delta.rowTracking.materialized*
    # ColumnName): a table written by another engine may name them
    # without our '_row-id-col-' prefix convention.
    from delta_rs_spark.plans.row_tracking import materialized_names

    hidden_stat_cols = set(materialized_names(cfg))
    for st in stats:
        for k in ("minValues", "maxValues", "nullCount"):
            d = (st or {}).get(k)
            if d:
                for name in list(d):
                    if name in hidden_stat_cols:
                        del d[name]
    for (abs_path, rel_path, part_vals), st in zip(moved, stats):
        # a file still without stats after the fallback scanned exactly
        # these paths contributed no rows to the grouped count: empty
        if st is None:
            st = {"numRecords": 0}
        if st.get("numRecords") == 0:
            os.unlink(abs_path)
            continue
        adds.append(
            Add(
                path=rel_path.replace(os.sep, "/"),
                size=os.path.getsize(abs_path),
                modification_time=int(os.path.getmtime(abs_path) * 1000),
                data_change=True,
                partition_values=part_vals,
                stats=stats_json(st),
            )
        )
    return adds


def _merge_schemas(existing: T.StructType, new: T.StructType) -> T.StructType:
    """Existing fields (by position) + brand-new fields appended
    (reference: kernel/schema/cast/merge_schema.rs)."""
    by_name = {f.name: f for f in new.fields}
    fields = []
    for f in existing.fields:
        nf = by_name.get(f.name)
        if nf is not None and nf.dataType != f.dataType:
            if not _can_widen(f.dataType, nf.dataType):
                raise SchemaMismatchError(
                    f"cannot merge column {f.name}: {f.dataType} vs {nf.dataType}"
                )
        fields.append(f)
    existing_names = {f.name for f in existing.fields}
    for f in new.fields:
        if f.name not in existing_names:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def _can_widen(old: T.DataType, new: T.DataType) -> bool:
    return old == new


GENERATION_KEY = "delta.generationExpression"
INVARIANTS_KEY = "delta.invariants"


def _conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast/select df to the table schema (missing columns -> null, or the
    column's generation expression when one is declared)
    (reference: kernel/schema/cast/mod.rs:212 cast_record_batch;
    operations/write/generated_columns.rs:20-38)."""
    cols = []
    df_cols = {f.name: f for f in df.schema.fields}
    for f in schema.fields:
        gen_expr = (f.metadata or {}).get(GENERATION_KEY)
        if f.name in df_cols:
            src = df_cols[f.name]
            c = F.col(f.name)
            if src.dataType != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        elif gen_expr:
            cols.append(F.expr(gen_expr).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    extra = [n for n in df_cols if n not in {f.name for f in schema.fields}]
    if extra:
        raise SchemaMismatchError(
            f"input has columns {extra} not in table schema; pass schema_mode='merge'"
        )
    return df.select(*cols)


def _validate_field_rules(df: DataFrame, schema: T.StructType, provided: set[str]) -> None:
    """Enforce generated-column equality for provided values and column
    invariants (reference: generated_columns.rs validation;
    kernel/schema/schema.rs:21-28 invariants)."""
    import json as _json

    checks: list[tuple[str, F.Column]] = []
    for f in schema.fields:
        meta = f.metadata or {}
        gen_expr = meta.get(GENERATION_KEY)
        if gen_expr and f.name in provided:
            checks.append(
                (
                    f"generated column {f.name} != {gen_expr}",
                    ~F.col(f.name).eqNullSafe(F.expr(gen_expr).cast(f.dataType)),
                )
            )
        inv = meta.get(INVARIANTS_KEY)
        if inv:
            try:
                expr = _json.loads(inv)["expression"]["expression"]
            except (ValueError, KeyError, TypeError):
                expr = None
            if expr:
                checks.append(
                    (
                        f"invariant violated on {f.name}: {expr}",
                        ~F.expr(expr).eqNullSafe(F.lit(True)),
                    )
                )
    for label, bad_cond in checks:
        if df.filter(bad_cond).limit(1).count():
            raise DeltaError(label)


def enforce_write_rules(df: DataFrame, snapshot) -> DataFrame:
    """Shared write-side data validation for MUTATION rewrites (UPDATE /
    MERGE and their DV variants): CHECK constraints from table config
    plus per-field invariants — the reference applies its
    DeltaDataChecker on every operation that produces rows
    (crates/core/src/delta_datafusion/data_validation.rs), not just
    appends. Pass only the CHANGED/INSERTED rows where the caller can:
    copied rows already satisfied the rules when they were written.

    Returns the DataFrame the caller MUST write (and unpersist after):
    when any rule exists the frame is persisted so the validation scan
    materializes exactly the rows the write will commit — without the
    cache, a non-deterministic rewrite expression (rand(),
    current_timestamp) could validate one set of rows and write
    another, and even deterministic rewrites would pay a second full
    evaluation. The zero-rules common case returns ``df`` untouched
    (no caching, no extra scan)."""
    import json as _json

    from delta_rs_spark.operators.alter import table_constraints

    checks: list[tuple[str, F.Column]] = []
    for cname, cexpr in table_constraints(snapshot.configuration).items():
        checks.append(
            (
                f"CHECK constraint {cname!r} ({cexpr}) violated",
                ~F.expr(cexpr).eqNullSafe(F.lit(True)),
            )
        )
    schema = T.StructType.fromJson(_json.loads(snapshot.schema_string))
    for f in schema.fields:
        # a generated column must equal its expression in every committed
        # row — catches an UPDATE/MERGE clause explicitly assigning a
        # wrong value (recomputed ones satisfy this by construction)
        gen_expr = (f.metadata or {}).get(GENERATION_KEY)
        if gen_expr:
            checks.append(
                (
                    f"generated column {f.name} != {gen_expr}",
                    ~F.col(f.name).eqNullSafe(
                        F.expr(gen_expr).cast(f.dataType)
                    ),
                )
            )
        inv = (f.metadata or {}).get(INVARIANTS_KEY)
        if inv:
            try:
                expr = _json.loads(inv)["expression"]["expression"]
            except (ValueError, KeyError, TypeError):
                continue
            checks.append(
                (
                    f"invariant violated on {f.name}: {expr}",
                    ~F.expr(expr).eqNullSafe(F.lit(True)),
                )
            )
    if not checks:
        return df
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    bad = checks[0][1]
    for _, cond in checks[1:]:
        bad = bad | cond
    try:
        # the zero-violations conclusion requires scanning every
        # partition, so this one job fully materializes the cache the
        # subsequent write reads
        if df.filter(bad).limit(1).count():
            # one combined pass to detect, a second (cache-read) only on
            # failure to name the violated rule
            for label, cond in checks:
                if df.filter(cond).limit(1).count():
                    raise DeltaError(label)
            raise DeltaError("write rule violated")
    except BaseException:
        df.unpersist()
        raise
    return df


def write_deltalake(
    table_or_uri: str,
    data: Any,
    *,
    spark: SparkSession | None = None,
    mode: str = "error",
    partition_by: list[str] | str | None = None,
    predicate: str | None = None,
    schema_mode: str | None = None,
    name: str | None = None,
    description: str | None = None,
    configuration: dict[str, str] | None = None,
    max_records_per_file: int | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    target_file_size: int | None = None,
    writer_properties=None,
    commit_properties=None,
    post_commithook_properties=None,
    storage_options: dict[str, str] | None = None,
    preserve_layout: bool = False,
    cluster_by: list[str] | str | None = None,
) -> None:
    """Write a DataFrame (Spark/pandas/arrow) to a Delta table.

    ``preserve_layout`` (engine extension, not a reference argument):
    skip the writer's hash-repartition on the partition columns and
    write the caller's task layout verbatim — for callers that arranged
    their own partitioning + within-partition sort (z-order rewrites,
    clustered index builds) which a fresh shuffle would destroy.

    Modes: error | ignore | append | overwrite. ``predicate`` is
    transactional replaceWhere (only valid with overwrite).

    ``target_file_size``/``writer_properties``/``commit_properties``/
    ``post_commithook_properties`` mirror the reference surface
    (python/deltalake/writer/writer.py:66-111); see
    delta_rs_spark.properties for the honored subset.
    ``storage_options`` is accepted for signature parity — this engine
    reads storage credentials from the Spark/Hadoop configuration, so
    entries here are validated as strings but otherwise unused.
    """
    if storage_options is not None and not isinstance(storage_options, dict):
        raise TypeError("storage_options must be a dict[str, str]")
    table_path = local_table_path(table_or_uri)
    df = _to_spark_df(data, spark)
    spark = df.sparkSession
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    partition_by = partition_by or []
    if mode not in ("error", "ignore", "append", "overwrite"):
        raise ValueError(f"invalid mode {mode!r}")
    if schema_mode not in (None, "merge", "overwrite"):
        raise ValueError(f"invalid schema_mode {schema_mode!r}")
    if predicate and mode != "overwrite":
        raise ValueError("predicate (replaceWhere) requires mode='overwrite'")

    exists = snap_mod.is_delta_table(table_path)
    snapshot = snap_mod.load_snapshot(table_path) if exists else None
    if snapshot is not None:
        from delta_rs_spark.plans.column_mapping import (
            ensure_schema_static,
            ensure_writable,
        )

        ensure_writable(snapshot)
        if schema_mode is not None:
            # same restriction as the reference (write/mod.rs:410-415):
            # evolved fields would need fresh columnMapping ids
            ensure_schema_static(snapshot)

    if exists and mode == "error":
        raise TableExistsError(f"table exists: {table_path} (mode='error')")
    if exists and mode == "ignore":
        return

    # idempotent writes via txn watermark (reference: actions.rs:1042)
    if exists and txn_app_id is not None and txn_version is not None:
        prev = snapshot.txns.get(txn_app_id)
        if prev is not None and prev.version >= txn_version:
            return

    from delta_rs_spark.plans import identity as _ident

    actions: list = []
    id_plan: dict[str, dict] = {}
    metrics: dict[str, Any] = {}
    from delta_rs_spark.plans.row_tracking import (
        cached_watermark as _rt_cached_watermark,
    )

    txn_info = TransactionInfo(
        blind_append=True,
        table_config=(
            snapshot.configuration if snapshot is not None else configuration
        ),
        rt_watermark=(
            _rt_cached_watermark(snapshot) if snapshot is not None else None
        ),
    )

    if snapshot is None:
        from delta_rs_spark.features import required_protocol
        from delta_rs_spark.plans.column_mapping import prepare_mapped_create

        # column mapping on create: assign ids + physical names; protocol
        # features derive from schema + configuration (as in create.rs)
        schema, configuration = prepare_mapped_create(df.schema, configuration)
        from delta_rs_spark.plans.row_tracking import prepare_create as _rt_create

        configuration = _rt_create(configuration)
        metadata = Metadata(
            schema_string=schema.json(),
            partition_columns=partition_by,
            configuration=configuration or {},
            name=name,
            description=description,
        )
        proto = required_protocol(schema.json(), configuration)
        if isinstance(cluster_by, str):
            cluster_by = [cluster_by]
        if cluster_by:
            # create-by-write of a CLUSTERED table (delta-spark liquid
            # clustering): persist the spec + features like create()
            from delta_rs_spark.log.actions import Protocol as _Protocol
            from delta_rs_spark.plans import clustering as _cl

            _cl.validate_cluster_by(cluster_by, schema, partition_by)
            feats = set(proto.writer_features or [])
            feats.update({_cl.FEATURE, "domainMetadata"})
            proto = _Protocol(
                min_reader_version=proto.min_reader_version,
                min_writer_version=7,
                reader_features=proto.reader_features,
                writer_features=sorted(feats),
            )
            actions.append(_cl.domain_action(cluster_by, schema))
        actions.append(proto)
        actions.append(metadata)
        read_version = -1
        table_schema = schema
        part_cols = partition_by
        # create-by-write: identity columns ride df.schema metadata, so
        # their values are the user's initial data — sync the watermark
        # over them (explicit-insert semantics for the defining write)
        for _f in _ident.identity_fields(table_schema):
            if _f.name in df.columns:
                id_plan[_f.name] = {
                    "step": int((_f.metadata or {}).get(_ident.META_STEP, 1)),
                    "explicit": True,
                }
    else:
        read_version = snapshot.version
        table_schema = T.StructType.fromJson(__import__("json").loads(snapshot.schema_string))
        part_cols = snapshot.partition_columns
        if partition_by and partition_by != part_cols:
            raise DeltaError(
                f"partition_by {partition_by} != table partitioning {part_cols}"
            )
        if cluster_by:
            from delta_rs_spark.plans import clustering as _cl

            existing_cl = _cl.clustering_columns(snapshot)
            want = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
            if want != (existing_cl or []):
                raise DeltaError(
                    f"cluster_by {want} != table clustering {existing_cl} "
                    "(use alter.set_clustering_columns to re-spec)"
                )
        # configuration on an EXISTING table: create-time keys are
        # normally frozen (the reference applies `configuration` at
        # create only), but an explicit overwrite may MERGE app-level
        # keys atomically with the data swap — sync_ivf_index's
        # recluster needs the retrained centroids and their matching
        # assignments to land in ONE commit (a reader between two
        # commits would probe new lists with old centroids). delta.*
        # keys stay frozen here: changing them can demand a protocol
        # upgrade, which is set_tbl_properties'/add_feature's job.
        merged_config = None
        if configuration is not None and mode == "overwrite":
            cand = {
                **snapshot.configuration,
                **{k: str(v) for k, v in configuration.items()},
            }
            if cand != snapshot.configuration:
                changed = {
                    k
                    for k in configuration
                    if snapshot.configuration.get(k) != str(configuration[k])
                }
                frozen = {k for k in changed if k.startswith("delta.")}
                if frozen:
                    raise DeltaError(
                        f"cannot change reserved table properties {sorted(frozen)} "
                        "via an overwrite write; use set_tbl_properties / "
                        "add_feature (they manage the protocol implications)"
                    )
                merged_config = cand
        if schema_mode == "overwrite":
            if mode != "overwrite":
                raise DeltaError("schema_mode='overwrite' requires mode='overwrite'")
            table_schema = df.schema
            meta = snapshot.metadata
            actions.append(
                Metadata(
                    schema_string=table_schema.json(),
                    partition_columns=part_cols,
                    configuration=merged_config or meta.configuration,
                    id=meta.id,
                    name=name or meta.name,
                    description=description or meta.description,
                    created_time=meta.created_time,
                )
            )
            merged_config = None  # emitted with the schema change
        elif schema_mode == "merge":
            merged = _merge_schemas(table_schema, df.schema)
            if merged.json() != table_schema.json():
                meta = snapshot.metadata
                actions.append(
                    Metadata(
                        schema_string=merged.json(),
                        partition_columns=part_cols,
                        configuration=merged_config or meta.configuration,
                        id=meta.id,
                        name=meta.name,
                        description=meta.description,
                        created_time=meta.created_time,
                    )
                )
                merged_config = None
            table_schema = merged
        if merged_config is not None:
            meta = snapshot.metadata
            actions.append(
                Metadata(
                    schema_string=table_schema.json(),
                    partition_columns=part_cols,
                    configuration=merged_config,
                    id=meta.id,
                    name=name or meta.name,
                    description=description or meta.description,
                    created_time=meta.created_time,
                )
            )
        provided = set(df.columns)
        if _ident.identity_fields(table_schema):
            df, id_plan = _ident.generate(df, table_schema)
        df = _conform(df, table_schema)
        _validate_field_rules(df, table_schema, provided)

    # enforce CHECK constraints before any file lands
    # (reference: crates/core/src/delta_datafusion/data_validation.rs:55-60)
    if snapshot is not None:
        from delta_rs_spark.operators.alter import table_constraints

        for cname, cexpr in table_constraints(snapshot.configuration).items():
            if df.filter(~F.expr(cexpr).eqNullSafe(F.lit(True))).limit(1).count():
                raise DeltaError(
                    f"CHECK constraint {cname!r} ({cexpr}) violated by incoming data"
                )

    if target_file_size is None and snapshot is not None:
        # honor the table-level default (reference table/config.rs:149)
        tfs = snapshot.configuration.get("delta.targetFileSize")
        if tfs:
            target_file_size = int(tfs)
    adds = write_files(
        df,
        table_path,
        part_cols,
        max_records_per_file,
        writer_properties=writer_properties,
        target_file_size=target_file_size,
        configuration=(
            snapshot.configuration if snapshot is not None else configuration
        ),
        table_schema_json=table_schema.json(),
        preserve_layout=preserve_layout,
    )
    if id_plan:
        # advance the identity high watermark over the values that just
        # landed (add stats; column-pruned fallback scan) — persisted as
        # field metadata in a Metadata action of THIS commit, so racing
        # identity writers conflict loudly via MetadataChanged
        _new_schema = _ident.watermark_updates(
            id_plan,
            table_schema,
            adds,
            table_path,
            df.sparkSession,
            configuration=(
                snapshot.configuration if snapshot is not None else configuration
            ),
        )
        if _new_schema is not None:
            _queued = [a for a in actions if isinstance(a, Metadata)]
            if _queued:
                _queued[-1].schema_string = _new_schema
            else:
                _m = snapshot.metadata
                actions.append(
                    Metadata(
                        schema_string=_new_schema,
                        partition_columns=part_cols,
                        configuration=_m.configuration,
                        id=_m.id,
                        name=_m.name,
                        description=_m.description,
                        created_time=_m.created_time,
                    )
                )
    actions.extend(adds)
    n_rows = sum(a.num_records() or 0 for a in adds)
    metrics["numFiles"] = len(adds)
    metrics["numOutputRows"] = n_rows
    metrics["numOutputBytes"] = sum(a.size for a in adds)

    if snapshot is not None and mode == "overwrite":
        txn_info = TransactionInfo(
            blind_append=False,
            read_whole_table=True,
            table_config=snapshot.configuration,
            rt_watermark=_rt_cached_watermark(snapshot),
        )
        if predicate:
            removes, extra_adds, n_removed = _replace_where(
                spark, snapshot, table_path, df, predicate, table_schema, part_cols
            )
            actions.extend(extra_adds)
            actions.extend(removes)
            metrics["numRemovedFiles"] = len(removes)
            metrics["numDeletedRows"] = n_removed
        else:
            ts = now_ms()
            for add in snapshot.files.values():
                actions.append(
                    Remove(
                        add.path,
                        deletion_timestamp=ts,
                        data_change=True,
                        partition_values=add.partition_values,
                        size=add.size,
                    )
                )
            metrics["numRemovedFiles"] = len(snapshot.files)

    if txn_app_id is not None and txn_version is not None:
        actions.append(Txn(txn_app_id, txn_version))
        # register the appId in the transaction's read set so a concurrent
        # commit advancing the same watermark raises
        # ConcurrentTransactionError during retry replay (ADVICE r01:
        # without this, two writers with the same app_id/txn_version could
        # both commit, breaking exactly-once)
        txn_info.app_ids.add(txn_app_id)

    op = CommitInfo(
        operation="WRITE",
        operation_parameters={
            "mode": {"error": "ErrorIfExists", "ignore": "Ignore", "append": "Append", "overwrite": "Overwrite"}[mode],
            **({"predicate": predicate} if predicate else {}),
            **({"partitionBy": part_cols} if part_cols else {}),
        },
        operation_metrics=metrics,
    )
    commit_mod.commit(
        table_path,
        actions,
        op,
        read_version,
        txn_info,
        commit_properties=commit_properties,
        post_commit=post_commithook_properties,
    )


def _replace_where(
    spark: SparkSession,
    snapshot: snap_mod.Snapshot,
    table_path: str,
    new_df: DataFrame,
    predicate: str,
    table_schema: T.StructType,
    part_cols: list[str],
) -> tuple[list[Remove], list[Add], int]:
    """Transactional replaceWhere (reference: write/mod.rs:228
    with_replace_where): delete existing rows matching the predicate,
    after validating that every incoming row satisfies it."""
    from delta_rs_spark.operators.delete import plan_predicate_removal
    from delta_rs_spark.table import read_snapshot_df

    bad = new_df.filter(~F.expr(predicate).eqNullSafe(F.lit(True))).limit(1).count()
    if bad:
        raise DeltaError(f"replaceWhere: input rows violate predicate {predicate!r}")
    removes, rewrite_adds, n_deleted = plan_predicate_removal(
        spark, snapshot, table_path, predicate
    )
    return removes, rewrite_adds, n_deleted
