"""Read the REFERENCE's own test-table corpus through this engine.

These are REAL Delta tables written by delta-rs and delta-spark
(crates/test/tests/data — used as INPUT DATA only): foreign layouts,
foreign checkpoint formats, preview-era features. Two kinds of ground
truth keep the checks independent of this engine's own log code:

* a RAW replay implemented here with plain ``json`` + pyarrow — live
  add set derived line-by-line from the commit JSONs, expected rows =
  union of per-file parquet reads + partitionValues literals;
* expectations the reference's own tests pin (e.g. table-with-dv-small
  keeps indexes 1..8 of 0..9 —
  delta_datafusion/table_provider/next/mod.rs expected_dv_small).
"""

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from delta_rs_spark import DeltaTable
from delta_rs_spark.log import snapshot as snap_mod

DATA = "/root/reference/crates/test/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference corpus not present"
)


def _raw_replay(table: str) -> tuple[list[dict], dict, list[str]]:
    """(live adds, latest metaData, partition columns) from the commit
    JSONs alone — plain json, no engine code. Checkpoints are read with
    pyarrow only when commits alone can't reconstruct state (none of
    the corpus tables used here need that)."""
    log = os.path.join(DATA, table, "_delta_log")
    files: dict[str, dict] = {}
    meta: dict = {}
    for f in sorted(os.listdir(log)):
        if len(f) == 25 and f.endswith(".json") and f[:20].isdigit():
            with open(os.path.join(log, f)) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    d = json.loads(line)
                    if "add" in d:
                        files[d["add"]["path"]] = d["add"]
                    elif "remove" in d:
                        files.pop(d["remove"]["path"], None)
                    elif "metaData" in d:
                        meta = d["metaData"]
    return list(files.values()), meta, meta.get("partitionColumns") or []


def _expected_df(spark, table: str):
    """Union of live files read directly with Spark + partition literals
    decoded from the add's partitionValues (independent of the engine's
    scan path)."""
    adds, meta, part_cols = _raw_replay(table)
    schema_json = json.loads(meta["schemaString"])
    schema = T.StructType.fromJson(schema_json)
    # under column mapping, add.partitionValues keys and parquet column
    # names use PHYSICAL names (PROTOCOL.md "Column Mapping")
    phys = {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in schema_json["fields"]
    }
    parts = []
    from urllib.parse import unquote

    for a in adds:
        local = os.path.join(DATA, table, unquote(a["path"]))
        if "%" in local:
            # Hadoop Path re-encodes literal % in plain path strings —
            # read special-char partition dirs with pyarrow instead
            import pyarrow.parquet as pq

            df = spark.createDataFrame(pq.read_table(local).to_pandas())
        else:
            df = spark.read.parquet(local)
        for logical, physical in phys.items():
            if logical not in part_cols and physical != logical:
                df = df.withColumnRenamed(physical, logical)
        for pc in part_cols:
            raw = (a.get("partitionValues") or {}).get(phys[pc])
            df = df.withColumn(pc, F.lit(raw).cast(schema[pc].dataType))
        parts.append(df.select([f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


@pytest.mark.parametrize(
    "table",
    [
        "simple_table",
        "delta-0.8.0",
        "delta-0.8.0-partitioned",
        "delta-0.8.0-null-partition",
        "delta-0.8.0-numeric-partition",
        "delta-0.8.0-special-partition",
        "delta-2.2.0-partitioned-types",
        "table_with_edge_timestamps",
    ],
)
def test_foreign_table_reads_match_raw_replay(spark, table, tmp_path):
    dt = DeltaTable(os.path.join(DATA, table), spark=spark)
    _, meta, _ = _raw_replay(table)
    cols = [
        f.name
        for f in T.StructType.fromJson(json.loads(meta["schemaString"])).fields
    ]
    got = _rows(dt.to_df().select(cols))
    want = _rows(_expected_df(spark, table).select(cols))
    assert got == want and len(got) > 0


def test_dv_table_matches_reference_expectation(spark):
    """table-with-dv-small: 10 rows, the reference pins keep_mask
    [F,T,T,T,T,T,T,T,T,F] (delta_datafusion .../next/mod.rs
    expected_dv_small) — indexes 0 and 9 deleted via a 'u' DV."""
    dt = DeltaTable(os.path.join(DATA, "table-with-dv-small"), spark=spark)
    assert sorted(r["value"] for r in dt.to_df().collect()) == list(range(1, 9))
    # count() goes through the stats/DV-cardinality path
    assert dt.count() == 8


def test_column_mapped_table_reads_logical_names(spark):
    """table_with_column_mapping (delta-spark, columnMapping.mode=name,
    partitioned by a mapped column with spaces in the logical name)."""
    dt = DeltaTable(os.path.join(DATA, "table_with_column_mapping"), spark=spark)
    df = dt.to_df()
    assert set(df.columns) == {"Company Very Short", "Super Name"}
    n = df.count()
    assert n > 0
    # partition pruning on the mapped partition column still works
    one = df.select("Company Very Short").distinct().limit(1).collect()[0][0]
    pruned = dt.to_df(predicate=f"`Company Very Short` = '{one}'")
    assert 0 < pruned.count() <= n


def test_liquid_clustering_preview_table(spark):
    """table_with_liquid_clustering: preview-era convention
    (delta.liquid.clusteringColumns property + 'liquid' writer feature
    + row tracking). clustering_columns() must surface the spec, reads
    must work, and row ids must surface through to_df_with_row_ids."""
    dt = DeltaTable(os.path.join(DATA, "table_with_liquid_clustering"), spark=spark)
    assert dt.clustering_columns() == ["id"]
    rows = dt.to_df_with_row_ids().collect()
    assert len(rows) == dt.count() > 0
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(len(rows)))  # baseRowId 0..n-1, 1 row/file


def test_v2_json_checkpoint_table(spark):
    """checkpoint-v2-table: delta-spark checkpointPolicy=v2 output —
    JSON top-level UUID-named checkpoints whose file actions live in
    parquet sidecars under _sidecars/. The snapshot must replay through
    the latest checkpoint + tail commits."""
    path = os.path.join(DATA, "checkpoint-v2-table")
    snap = snap_mod.load_snapshot(path)
    commits, checkpoints = snap_mod.list_log(path)
    assert checkpoints, "v2 JSON checkpoints must be discovered"
    assert snap.version == max(commits + checkpoints)
    dt = DeltaTable(path, spark=spark)
    got = _rows(dt.to_df().select("id", "name"))
    want = _rows(_expected_df(spark, "checkpoint-v2-table").select("id", "name"))
    assert got == want and len(got) > 0


def test_domain_metadata_table_from_checkpoint(spark):
    """table-with-domain-metadata: state lives ONLY in a classic
    checkpoint (commit 108 + checkpoint, earlier commits cleaned).
    Domain metadata must replay from the checkpoint."""
    path = os.path.join(DATA, "table-with-domain-metadata")
    snap = snap_mod.load_snapshot(path)
    assert snap.domain_metadata, "expected domains replayed from checkpoint"
    assert len(snap.files) > 0


def test_cdf_table_reads_and_follows_changes(spark):
    """cdf-table (delta-spark, partitioned, CDF enabled): the final
    state must match the raw replay and load_cdf must produce change
    rows for the update commits."""
    path = os.path.join(DATA, "cdf-table")
    dt = DeltaTable(path, spark=spark)
    got = _rows(dt.to_df())
    want = _rows(_expected_df(spark, "cdf-table"))
    assert got == want and len(got) > 0
    cdf = dt.load_cdf(starting_version=1)
    kinds = {r["_change_type"] for r in cdf.collect()}
    assert kinds & {"update_preimage", "update_postimage", "delete", "insert"}


def test_empty_create_only_table(spark):
    """simple_commit: a CREATE-only commit (no adds) — an EMPTY table
    must load with its schema and read zero rows."""
    dt = DeltaTable(os.path.join(DATA, "simple_commit"), spark=spark)
    assert dt.count() == 0
    assert len(dt.schema().fields) > 0
    assert dt.to_df().count() == 0


@pytest.mark.parametrize(
    "table",
    [
        "partition-type-primitives",
        "COVID-19_NYT",
        "http_requests",
        "delta-stats-optional",
        "table_with_null_stats_in_notnull_struct",
    ],
)
def test_more_foreign_tables_match_raw_replay(spark, table):
    """Batch 2: stats-optional tables (adds without stats — skipping
    must degrade, never refuse), real-world datasets, primitive-typed
    partition values."""
    dt = DeltaTable(os.path.join(DATA, table), spark=spark)
    _, meta, _ = _raw_replay(table)
    cols = [
        f.name
        for f in T.StructType.fromJson(json.loads(meta["schemaString"])).fields
    ]
    got = _rows(dt.to_df().select(cols))
    want = _rows(_expected_df(spark, table).select(cols))
    assert got == want and len(got) > 0


@pytest.mark.parametrize(
    "table",
    [
        "simple_table_with_checkpoint",
        "with_checkpoint_no_last_checkpoint",
        "latest_not_checkpointed",
        "python-0.25.5-checkpoint",
        "delta-checkpoint-stats-optional",
        "delta-1.2.1-only-struct-stats",
        "table_failed_last_checkpoint_update",
    ],
)
def test_foreign_checkpoint_replay_matches_commit_replay(spark, table):
    """FOREIGN parquet checkpoints (delta-spark and old delta-rs): the
    engine replays state THROUGH the checkpoint (+tail commits); the
    raw replay here walks the full commit history with plain json. The
    live file sets must agree exactly. Covers: no _last_checkpoint,
    checkpoint newer than _last_checkpoint, stale/failed
    _last_checkpoint update, struct-only stats (stats_parsed, no json
    stats column), stats-optional adds."""
    path = os.path.join(DATA, table)
    snap = snap_mod.load_snapshot(path)
    adds, _, _ = _raw_replay(table)
    want = {(a["path"], tuple(sorted((a.get("partitionValues") or {}).items())))
            for a in adds}
    got = {(p, tuple(sorted((a.partition_values or {}).items())))
           for p, a in snap.files.items()}
    assert got == want and len(got) > 0
    # the table also READS through whatever stats the checkpoint carried
    dt = DeltaTable(path, spark=spark)
    assert dt.count() >= 0


def test_checkpoint_only_history_table_reads(spark):
    """checkpoint_with_partitions: commit 0 cleaned away — state must
    replay from the foreign checkpoint alone, partition values intact."""
    dt = DeltaTable(os.path.join(DATA, "checkpoint_with_partitions"), spark=spark)
    assert len(dt._snapshot.files) > 0
    for a in dt._snapshot.files.values():
        assert a.partition_values, "checkpoint must carry partitionValues"


def test_unknown_reader_feature_refused(spark):
    """simple_table_features demands reader feature 'blahabl' — reading
    a table whose reader features we don't understand would be a silent
    misread; the engine must refuse loudly (kernel does the same)."""
    from delta_rs_spark.log.commit import DeltaError

    with pytest.raises(DeltaError):
        DeltaTable(os.path.join(DATA, "simple_table_features"), spark=spark)


@pytest.mark.parametrize(
    "table",
    [
        "delta-0.8.0-date",
        "table_with_partitioning_mapping",
        "simple_table_with_cdc",
        "golden/data-reader-array-primitives",
    ],
)
def test_batch3_foreign_tables_match_raw_replay(spark, table):
    """Batch 3: DATE partition values, column-mapped PARTITIONED layout,
    CDC-writing table, golden array-typed reader table."""
    dt = DeltaTable(os.path.join(DATA, table), spark=spark)
    _, meta, _ = _raw_replay(table)
    cols = [
        f.name
        for f in T.StructType.fromJson(json.loads(meta["schemaString"])).fields
    ]
    got = _rows(dt.to_df().select(cols))
    want = _rows(_expected_df(spark, table).select(cols))
    assert got == want and len(got) > 0


@pytest.mark.parametrize(
    "table", ["issue-2152", "concurrent_workers", "delta-live-table"]
)
def test_batch3_empty_created_tables(spark, table):
    """CREATE-only tables (zero add actions) must load and scan as an
    empty DataFrame with the declared schema — the reference's own
    regression fixtures for issues 2152 / concurrent worker creation,
    plus the DLT fixture whose v0 metaData has NO schemaString (issue
    #1302, read_delta_log_test.rs read_delta_table_from_dlt; the v1
    metaData carries the real schema and replay keeps the last one)."""
    dt = DeltaTable(os.path.join(DATA, table), spark=spark)
    _, meta, _ = _raw_replay(table)
    want_cols = [
        f.name
        for f in T.StructType.fromJson(json.loads(meta["schemaString"])).fields
    ]
    df = dt.to_df()
    assert df.columns == want_cols
    assert df.count() == 0
    assert len(dt._snapshot.files) == 0


@pytest.mark.parametrize("table", ["issue_1374", "table_with_deletion_logs"])
def test_batch3_checkpointed_tables_load_and_read(spark, table):
    """Deep delete logs: the checkpoint + tail replay must produce a
    readable snapshot whose live files all exist on disk (vacuum removed
    only tombstoned ones)."""
    from delta_rs_spark.operators.util import resolve_add_path

    path = os.path.join(DATA, table)
    dt = DeltaTable(path, spark=spark)
    assert len(dt._snapshot.files) > 0
    for a in dt._snapshot.files.values():
        assert os.path.exists(resolve_add_path(path, a.path)), a.path


def test_batch3_vacuumed_log_history(spark):
    """checkpoints_vacuumed is a LOG-ONLY fixture (data files deleted,
    commits 0-4 cleaned up): the snapshot must still replay from the v5
    checkpoint + tail to version 12, and history must serve both the
    in-log range and clamp gracefully below it (reference
    crates/core/src/lib.rs test_read_vacuumed_log{,_history})."""
    dt = DeltaTable(os.path.join(DATA, "checkpoints_vacuumed"), spark=spark)
    assert dt.version() == 12
    hist5 = dt.history(5)
    assert len(hist5) == 5
    full = dt.history()
    # commits 0-4 were metadata-cleaned: only 5..12 remain readable
    assert {h["version"] for h in full} == set(range(5, 13))


def test_empty_foreign_table(spark):
    """delta-0.8-empty: a real empty table (adds then deleted)."""
    dt = DeltaTable(os.path.join(DATA, "delta-0.8-empty"), spark=spark)
    assert dt.count() == 0 and dt.to_df().count() == 0
