"""load_cdf — Change Data Feed between versions/timestamps.

(reference: crates/core/src/operations/load_cdf.rs — CDC file reads +
synthesized insert/delete rows from Add/Remove commits :46-70, union
plan :22-30; python surface python/deltalake/table.py:448-484)

Per commit in range:
* commits carrying AddCDCFile actions -> read those files (they already
  contain ``_change_type``);
* otherwise dataChange Adds -> synthesize ``insert`` rows from the added
  files, and dataChange Removes -> synthesize ``delete`` rows by reading
  the removed files (valid until VACUUM).

Adds the reference's change columns: ``_change_type``,
``_commit_version``, ``_commit_timestamp``.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.actions import Add, AddCDCFile, Remove
from delta_rs_spark.log.commit import DeltaError
from delta_rs_spark.operators.cdc import CHANGE_TYPE_COL
from delta_rs_spark.operators.util import resolve_add_path


def _parse_ts_ms(ts: str) -> int:
    try:
        parsed = dt.datetime.fromisoformat(ts.replace("Z", "+00:00"))
    except ValueError as e:
        raise DeltaError(f"bad timestamp {ts!r}") from e
    if parsed.tzinfo is None:
        parsed = parsed.replace(tzinfo=dt.timezone.utc)
    return int(parsed.timestamp() * 1000)


def _commit_ts_ms(table_path: str, version: int, ci_map=None) -> int:
    """Commit timestamp: commitInfo.timestamp when present, else the
    commit file's mtime (same fallback the per-version loop uses)."""
    ci = (ci_map or {}).get(version)
    if ci is not None and ci.timestamp:
        return int(ci.timestamp)
    try:
        ci = snap_mod.read_commit_info(table_path, version)
        if ci is not None and ci.timestamp:
            return int(ci.timestamp)
    except FileNotFoundError:
        pass
    try:
        return int(
            os.path.getmtime(snap_mod.commit_file(table_path, version)) * 1000
        )
    except OSError:
        # checkpoint-only latest version (expired commit JSONs): no
        # commit timestamp to compare against — treat as unbounded so
        # the per-version filter below decides
        return 2**62


def load_cdf(
    spark: SparkSession,
    table_path: str,
    starting_version: int = 0,
    ending_version: int | None = None,
    starting_timestamp: str | None = None,
    ending_timestamp: str | None = None,
    columns: list[str] | None = None,
    predicate: str | None = None,
    allow_out_of_range: bool = False,
) -> DataFrame:
    from delta_rs_spark.table import read_snapshot_df

    latest = snap_mod.latest_version(table_path)
    if latest is None:
        raise DeltaError(f"not a Delta table: {table_path}")
    # timestamp bounds are a PER-COMMIT inclusive filter on the commit's
    # own timestamp (reference load_cdf.rs:270-287 skips versions whose
    # commitInfo ts falls outside [starting, ending]) — NOT an
    # at-or-before version mapping like time travel: a starting_timestamp
    # strictly between two commits must EXCLUDE the earlier one.
    start_ts_ms = _parse_ts_ms(starting_timestamp) if starting_timestamp else None
    end_ts_ms = _parse_ts_ms(ending_timestamp) if ending_timestamp else None
    if start_ts_ms is not None and start_ts_ms > _commit_ts_ms(table_path, latest):
        # reference: ChangeDataTimestampGreaterThanCommit (load_cdf.rs:244-252)
        if allow_out_of_range:
            ending_version = starting_version - 1  # empty feed below
        else:
            raise DeltaError(
                f"starting_timestamp {starting_timestamp} is greater than "
                f"the latest commit timestamp"
            )
    if starting_version > latest and not allow_out_of_range:
        raise DeltaError(f"starting_version {starting_version} > latest {latest}")
    if ending_version is None:
        ending_version = latest
    ending_version = min(ending_version, latest)
    if ending_version < starting_version and not (
        allow_out_of_range or starting_version > latest
    ):
        # reference: ChangeDataInvalidVersionRange (load_cdf.rs:208-213);
        # an out-of-range START already passed the allow gate above
        raise DeltaError(
            f"invalid CDF version range: start {starting_version} > "
            f"end {ending_version}"
        )

    # incremental log replay: load the base snapshot ONCE, then apply each
    # commit's actions forward — O(log + range x files) instead of a full
    # snapshot reconstruction per version (reference: load_cdf.rs streams
    # the log the same way)
    snap = None
    if starting_version > 0:
        try:
            # clamp: an allowed out-of-range start skips the loop entirely
            # and returns the empty change feed below
            snap = snap_mod.load_snapshot(
                table_path, min(starting_version - 1, latest)
            )
        except FileNotFoundError:
            pass  # log cleaned below the checkpoint floor — seeded below
    elif os.path.exists(snap_mod.commit_file(table_path, 0)):
        snap = snap_mod.Snapshot(table_path=table_path)
    if snap is None:
        # metadata-cleaned log (reference checkpoint-cdf-table fixture):
        # commits below the checkpoint floor are gone and the table's
        # metaData/protocol live ONLY in the checkpoint, so an empty
        # in-memory base would leave snap.metadata None and silently
        # yield an EMPTY feed. Seed state from the earliest
        # reconstructible snapshot (the checkpoint floor) — matching the
        # reference, which reads the feed's schema from the SNAPSHOT
        # because cleaned commits cannot carry it (load_cdf.rs:464-468).
        # The floor version's own commit (if in range) re-applies its
        # actions idempotently; its remove-fallback pre-images degrade to
        # pseudo-adds synthesized from the remove actions themselves,
        # exactly how the reference reads removed files (the remove
        # carries path + partitionValues under extendedFileMetadata).
        _, _cps = snap_mod.list_log(table_path)
        if _cps:
            snap = snap_mod.load_snapshot(table_path, min(_cps))
        else:
            snap = snap_mod.Snapshot(table_path=table_path)

    # file-level pruning (reference load_cdf.rs:64-68, :357-359 —
    # "used ONLY to prune files by their partition values"): the
    # partition-only conjuncts of ``predicate`` drop CDC/Add/Remove
    # files from non-matching partitions BEFORE any read; the full
    # predicate still runs as the residual row filter at the end, so
    # non-partition conjuncts and inexact ones cost nothing in
    # correctness. Without this a partition-scoped load_cdf pays a full
    # range scan.
    from delta_rs_spark.plans.skipping import (
        col_types_from_schema_json,
        parse_conjuncts,
    )

    pred_conjuncts = parse_conjuncts(predicate) if predicate else []

    def _partition_prune(actions_list, snap):
        if not pred_conjuncts:
            return actions_list
        pcols = snap.partition_columns
        if not pcols:
            return actions_list
        from delta_rs_spark.plans import column_mapping as cmap

        ctypes = col_types_from_schema_json(json.loads(snap.schema_string))
        physical_of = cmap.snapshot_physical_of(snap)
        part_conj = [c for c in pred_conjuncts if c.col in pcols]
        if not part_conj:
            return actions_list

        def _may_match(a) -> bool:
            pv = getattr(a, "partition_values", None)
            if pv is None:
                return True  # e.g. a Remove without extended metadata
            for c in part_conj:
                key = (physical_of or {}).get(c.col, c.col)
                if key not in pv:
                    # value not recorded: an absent key would read as
                    # NULL and wrongly prune — keep conservatively
                    return True
            return all(c.keep(a, pcols, ctypes, physical_of) for c in part_conj)

        return [a for a in actions_list if _may_match(a)]

    parts: list[DataFrame] = []
    for v in range(starting_version, ending_version + 1):
        try:
            actions = snap_mod.read_commit_actions(table_path, v)
        except FileNotFoundError:
            continue
        pre_metadata = snap.metadata  # removed files conform to the PRE schema
        pre_files = dict(snap.files)
        for a in actions:
            snap.apply(a, v)
        snap.version = v
        if snap.metadata is None:
            continue
        schema = T.StructType.fromJson(json.loads(snap.schema_string))
        ci = snap.commit_infos.get(v)
        ts_ms = (ci.timestamp if ci else None) or int(
            os.path.getmtime(snap_mod.commit_file(table_path, v)) * 1000
        )
        if (start_ts_ms is not None and ts_ms < start_ts_ms) or (
            end_ts_ms is not None and ts_ms > end_ts_ms
        ):
            # inclusive per-commit bound (reference load_cdf.rs:270-287;
            # its datetime fixture test keeps the commit whose ts equals
            # the bound exactly) — snap already advanced, so later
            # versions still replay against the right base
            continue
        ts_col = F.timestamp_millis(F.lit(ts_ms))

        raw_cdc = [a for a in actions if isinstance(a, AddCDCFile)]
        cdc = _partition_prune(raw_cdc, snap)
        adds = _partition_prune(
            [a for a in actions if isinstance(a, Add) and a.data_change], snap
        )
        removes = _partition_prune(
            [a for a in actions if isinstance(a, Remove) and a.data_change], snap
        )
        if raw_cdc and not cdc:
            # the commit's changes all live in pruned partitions; falling
            # through would wrongly re-synthesize from Add/Remove
            continue

        if cdc:
            from delta_rs_spark.plans import column_mapping as cmap

            mapped = cmap.mapping_mode(snap.configuration) != "none"
            read_schema = cmap.physical_schema(schema) if mapped else schema
            phys_of = cmap.logical_to_physical(schema) if mapped else {}
            # change-data parquet files NEVER contain the partition
            # columns physically (delta-spark and this engine both write
            # them partition-dir style); the values ride the AddCDCFile
            # action's partitionValues — group by that tuple and inject
            # typed literals, exactly like read_snapshot_df's non-Hive
            # groups. Reading with a schema that includes the partition
            # column would silently yield NULLs (the pre-r12 bug the
            # reference's cdf-table corpus exposed).
            part_phys = [
                phys_of.get(pc, pc) for pc in snap.partition_columns or []
            ]
            cdc_schema = T.StructType(
                [f for f in read_schema.fields if f.name not in part_phys]
                + [T.StructField(CHANGE_TYPE_COL, T.StringType(), True)]
            )
            groups: dict[tuple, list[str]] = {}
            for c in cdc:
                key = tuple(sorted((c.partition_values or {}).items()))
                groups.setdefault(key, []).append(
                    resolve_add_path(table_path, c.path)
                )
            gdfs = []
            for pv_key, paths in groups.items():
                g = spark.read.schema(cdc_schema).parquet(*paths)
                pv = dict(pv_key)
                for pc in part_phys:
                    g = g.withColumn(
                        pc, F.lit(pv.get(pc)).cast(read_schema[pc].dataType)
                    )
                gdfs.append(
                    g.select(
                        [f.name for f in read_schema.fields] + [CHANGE_TYPE_COL]
                    )
                )
            df = gdfs[0]
            for g in gdfs[1:]:
                df = df.unionByName(g)
            if mapped:
                df = cmap.rename_to_logical(
                    df, schema, extra_cols=[CHANGE_TYPE_COL]
                )
        else:
            pieces = []
            # DV update pairs (same path removed+added in one commit, e.g.
            # a soft DELETE without CDF enabled): the change set is the
            # DIFF of the two deletion vectors — synthesizing from the
            # raw add/remove would wrongly report every surviving row as
            # inserted and every pre-image row as deleted
            add_by_path = {a.path: a for a in adds}
            pair_paths = {r.path for r in removes if r.path in add_by_path}
            if pair_paths:
                from delta_rs_spark.plans.deletion_vectors import (
                    load_dv_row_indexes,
                )

                rm_by_path = {r.path: r for r in removes}
                dead_pairs = []  # (abs_path, row_index): newly DV-dead
                born_pairs = []  # (abs_path, row_index): DV rows REVIVED
                for path in sorted(pair_paths):
                    a = add_by_path[path]
                    r = rm_by_path[path]
                    new_rows = (
                        set(load_dv_row_indexes(table_path, a.deletion_vector))
                        if a.deletion_vector
                        else set()
                    )
                    old_rows = (
                        set(load_dv_row_indexes(table_path, r.deletion_vector))
                        if r.deletion_vector
                        else set()
                    )
                    abs_path = resolve_add_path(table_path, path)
                    dead_pairs += [(abs_path, ri) for ri in sorted(new_rows - old_rows)]
                    # rows dead in the OLD pairing but alive in the NEW
                    # one (RESTORE past a DV delete) become visible again
                    # and must surface as inserts
                    born_pairs += [(abs_path, ri) for ri in sorted(old_rows - new_rows)]
                if dead_pairs or born_pairs:
                    from delta_rs_spark.plans import column_mapping as cmap
                    from delta_rs_spark.table import _normalize_file_path

                    # column-mapped files carry physical col-<uuid> names:
                    # read with the physical schema and rename after the
                    # (file, row_index) join, like the cdc branch above —
                    # a logical-schema read would yield all-null columns
                    mapped = cmap.mapping_mode(snap.configuration) != "none"
                    pair_schema = (
                        cmap.physical_schema(schema) if mapped else schema
                    )
                    reader = spark.read.schema(pair_schema)
                    if snap.partition_columns:
                        reader = reader.option("basePath", table_path)
                    scanned = (
                        reader.parquet(
                            *[resolve_add_path(table_path, p) for p in sorted(pair_paths)]
                        )
                        .withColumn(
                            "__sfp",
                            _normalize_file_path(F.col("_metadata.file_path")),
                        )
                        .withColumn("__sri", F.col("_metadata.row_index"))
                    )

                    def _pair_rows(pairs: list, change: str):
                        pair_df = spark.createDataFrame(
                            pairs, "__fp string, __ri long"
                        )
                        rows = scanned.join(
                            F.broadcast(pair_df),
                            (F.col("__sfp") == F.col("__fp"))
                            & (F.col("__sri") == F.col("__ri")),
                            "inner",
                        ).drop("__sfp", "__sri", "__fp", "__ri")
                        if mapped:
                            rows = cmap.rename_to_logical(rows, schema)
                        return rows.withColumn(CHANGE_TYPE_COL, F.lit(change))

                    if dead_pairs:
                        pieces.append(_pair_rows(dead_pairs, "delete"))
                    if born_pairs:
                        pieces.append(_pair_rows(born_pairs, "insert"))
                adds = [a for a in adds if a.path not in pair_paths]
                removes = [r for r in removes if r.path not in pair_paths]
            if adds:
                ins = read_snapshot_df(spark, snap, table_path, files=adds)
                pieces.append(ins.withColumn(CHANGE_TYPE_COL, F.lit("insert")))
            if removes and pre_metadata is not None:
                pre_snap = snap_mod.Snapshot(table_path=table_path)
                pre_snap.metadata = pre_metadata
                rm_adds = []
                for r in removes:
                    if r.path in pre_files:
                        rm_adds.append(pre_files[r.path])
                    elif r.partition_values is not None or not snap.partition_columns:
                        # cleaned-log floor: the pre-image Add is gone from
                        # the reconstructible base, but the remove action
                        # itself carries path + partitionValues
                        # (extendedFileMetadata) — synthesize a pseudo-add,
                        # like the reference which reads removed files
                        # straight off the remove action (load_cdf.rs
                        # remove_files specs)
                        rm_adds.append(
                            Add(
                                path=r.path,
                                size=r.size or 0,
                                modification_time=r.deletion_timestamp or 0,
                                partition_values=dict(r.partition_values or {}),
                            )
                        )
                if rm_adds:
                    deleted = read_snapshot_df(spark, pre_snap, table_path, files=rm_adds)
                    pieces.append(deleted.withColumn(CHANGE_TYPE_COL, F.lit("delete")))
            if not pieces:
                continue
            df = pieces[0]
            for p in pieces[1:]:
                df = df.unionByName(p, allowMissingColumns=True)

        df = df.withColumn("_commit_version", F.lit(v).cast("long")).withColumn(
            "_commit_timestamp", ts_col
        )
        parts.append(df)

    if not parts:
        snapshot = snap_mod.load_snapshot(table_path)
        schema = T.StructType.fromJson(json.loads(snapshot.schema_string))
        empty_schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField(CHANGE_TYPE_COL, T.StringType(), True),
                T.StructField("_commit_version", T.LongType(), True),
                T.StructField("_commit_timestamp", T.TimestampType(), True),
            ]
        )
        return spark.createDataFrame([], empty_schema)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    if predicate:
        out = out.filter(F.expr(predicate))
    if columns:
        out = out.select(*columns)
    return out
