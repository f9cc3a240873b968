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


# ---------------------------------------------------------------------------
# Batch 4: variant tables, the reference's pinned CDF expectations,
# remaining plain corpus tables
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "table",
    ["COVID-19_NYT", "delta-0.2.0", "table-without-dv-small",
     "cdf-table-non-partitioned"],
)
def test_batch4_foreign_tables_match_raw_replay(spark, table):
    """Plain reads of the remaining corpus tables: a multi-file public
    dataset, the OLDEST writer era (delta 0.2.0, pre-stats adds +
    checkpoint), the DV-less twin of table-with-dv-small, and the CDF
    fixture's final state."""
    dt = DeltaTable(os.path.join(DATA, table), spark=spark)
    _, meta, _ = _raw_replay(table)
    cols = [
        f.name
        for f in T.StructType.fromJson(json.loads(meta["schemaString"])).fields
    ]
    got = _rows(dt.to_df().select(cols))
    want = _rows(_expected_df(spark, table).select(cols))
    assert got == want and len(got) > 0


def test_batch4_log_only_checkpointed_fixture(spark):
    """'checkpoints' (13 commits + mid-log checkpoints, NO data files on
    disk): the engine's live-file SET after checkpoint+tail replay must
    equal the pure-JSON raw replay's — checkpoint content and tail
    application agree exactly."""
    dt = DeltaTable(os.path.join(DATA, "checkpoints"), spark=spark)
    adds, _, _ = _raw_replay("checkpoints")
    assert set(dt._snapshot.files) == {a["path"] for a in adds}
    assert dt.version() == 12


def test_batch4_variant_preview_table_reads(spark):
    """spark-variant-checkpoint (reader feature variantType-preview,
    checkpoint at v2): Spark 4 reads the variant columns natively.
    Reference pins version 2 / minReader 3 / the preview feature / one
    top-level variant field (crates/core/tests/variant.rs:50-80); data
    check here goes further: v's '$.key' equals id on every row."""
    dt = DeltaTable(os.path.join(DATA, "spark-variant-checkpoint"), spark=spark)
    assert dt.version() == 2
    assert dt.protocol().min_reader_version == 3
    assert "variantType-preview" in (dt.protocol().reader_features or [])
    df = dt.to_df()
    assert dict(df.dtypes)["v"] == "variant"
    assert dict(df.dtypes)["array_of_variants"] == "array<variant>"
    n = df.count()
    adds, _, _ = _raw_replay("spark-variant-checkpoint")
    assert n == sum(json.loads(a["stats"])["numRecords"] for a in adds)
    mism = df.where(
        F.try_variant_get("v", "$.key", "long") != F.col("id")
    ).count()
    assert mism == 0


def test_batch4_variant_stable_feature_log_only(spark):
    """spark-variant-stable-feature-checkpoint is LOG-ONLY (no data
    files): reference pins version 1, minReader 3, the STABLE
    variantType feature, v: variant, struct_of_variants: struct
    (variant.rs:82-110)."""
    dt = DeltaTable(
        os.path.join(DATA, "spark-variant-stable-feature-checkpoint"),
        spark=spark,
    )
    assert dt.version() == 1
    assert dt.protocol().min_reader_version == 3
    assert "variantType" in (dt.protocol().reader_features or [])
    sch = dt.schema()
    assert isinstance(sch["v"].dataType, T.VariantType)
    assert isinstance(sch["struct_of_variants"].dataType, T.StructType)


def test_batch4_variant_shredded_refused(spark):
    """The shredded-variant preview table must be REFUSED: its
    variantShredding-preview reader feature is not implemented, and a
    plain variant read would silently misdecode shredded values — the
    reference's table_provider errors the same way (variant.rs:112-121
    expects 'VariantShreddingPreview')."""
    from delta_rs_spark.log.commit import DeltaError

    with pytest.raises(DeltaError, match="variantShredding"):
        DeltaTable(
            os.path.join(DATA, "spark-shredded-variant-preview-delta"),
            spark=spark,
        )


_CDF_TS = {
    0: "2024-04-14 15:58:26.249000",
    1: "2024-04-14 15:58:29.393000",
    2: "2024-04-14 15:58:31.257000",
    3: "2024-04-14 15:58:32.495000",
    4: "2024-04-14 15:58:33.444000",
}

# (id, name, birthday, long_field, _change_type, _commit_version) — the
# full 26-row batch the reference pins for starting_version=0
# (load_cdf.rs test_load_local_non_partitioned)
_CDF_EXPECTED = [
    (1, "Steve", "2024-04-14", 1, "insert", 0),
    (2, "Bob", "2024-04-15", 1, "insert", 0),
    (3, "Dave", "2024-04-15", 2, "insert", 0),
    (4, "Kate", "2024-04-15", 3, "insert", 0),
    (5, "Emily", "2024-04-16", 4, "insert", 0),
    (6, "Carl", "2024-04-16", 5, "insert", 0),
    (7, "Dennis", "2024-04-16", 6, "insert", 0),
    (8, "Claire", "2024-04-17", 7, "insert", 0),
    (9, "Ada", "2024-04-17", 8, "insert", 0),
    (10, "Borb", "2024-04-17", 99999999999999999, "insert", 0),
    (2, "Bob", "2024-04-15", 1, "update_preimage", 1),
    (2, "Bob", "2024-04-14", 1, "update_postimage", 1),
    (3, "Dave", "2024-04-15", 2, "update_preimage", 1),
    (3, "Dave", "2024-04-14", 2, "update_postimage", 1),
    (4, "Kate", "2024-04-15", 3, "update_preimage", 1),
    (4, "Kate", "2024-04-14", 3, "update_postimage", 1),
    (5, "Emily", "2024-04-16", 4, "update_preimage", 2),
    (5, "Emily", "2024-04-14", 4, "update_postimage", 2),
    (6, "Carl", "2024-04-16", 5, "update_preimage", 2),
    (6, "Carl", "2024-04-14", 5, "update_postimage", 2),
    (7, "Dennis", "2024-04-16", 6, "update_preimage", 2),
    (7, "Dennis", "2024-04-14", 6, "update_postimage", 2),
    (7, "Dennis", "2024-04-14", 6, "delete", 3),
    (1, "Alex", "2024-04-14", 1, "insert", 4),
    (2, "Alan", "2024-04-15", 1, "insert", 4),
]


def test_batch4_cdf_matches_reference_pin(spark):
    """load_cdf(starting_version=0) over cdf-table-non-partitioned must
    reproduce the reference's pinned 26-row change feed byte-for-byte —
    including constant columns and per-commit timestamps
    (load_cdf.rs:1200-1248)."""
    dt = DeltaTable(os.path.join(DATA, "cdf-table-non-partitioned"), spark=spark)
    rows = dt.load_cdf(starting_version=0).collect()
    got = sorted(
        (
            r.id, r.name, str(r.birthday), r.long_field, r.boolean_field,
            float(r.double_field), r.smallint_field, r._change_type,
            r._commit_version, str(r._commit_timestamp),
        )
        for r in rows
    )
    want = sorted(
        (i, n, b, lf, True, 3.14, 1, ct, cv, _CDF_TS[cv])
        for (i, n, b, lf, ct, cv) in _CDF_EXPECTED
    )
    assert got == want


def test_batch4_cdf_range_semantics(spark):
    """Bounds parity with load_cdf.rs:1250-1345: start>end errors
    (ChangeDataInvalidVersionRange); start>latest errors
    (InvalidVersion) but yields an EMPTY feed with allow_out_of_range;
    a starting_timestamp beyond the last commit errors
    (ChangeDataTimestampGreaterThanCommit) / empties with the flag; an
    ending_timestamp EQUAL to a commit's own ts keeps that commit
    (inclusive bound, test_load_local_datetime)."""
    from delta_rs_spark.log.commit import DeltaError

    dt = DeltaTable(os.path.join(DATA, "cdf-table-non-partitioned"), spark=spark)
    with pytest.raises(DeltaError, match="range"):
        dt.load_cdf(starting_version=4, ending_version=1)
    with pytest.raises(DeltaError, match="starting_version"):
        dt.load_cdf(starting_version=5)
    assert dt.load_cdf(starting_version=5, allow_out_of_range=True).count() == 0
    with pytest.raises(DeltaError, match="greater than"):
        dt.load_cdf(starting_timestamp="2033-12-22T17:10:21.675")
    assert (
        dt.load_cdf(
            starting_timestamp="2033-12-22T17:10:21.675", allow_out_of_range=True
        ).count()
        == 0
    )
    # inclusive ending bound: v0..v1 only (v1's ts is the bound itself)
    upto_v1 = dt.load_cdf(ending_timestamp="2024-04-14T15:58:29.393")
    assert set(r._commit_version for r in upto_v1.collect()) == {0, 1}
    # starting ts strictly between v0 and v1 excludes v0 entirely
    from_mid = dt.load_cdf(starting_timestamp="2024-04-14T15:58:27.000")
    assert set(r._commit_version for r in from_mid.collect()) == {1, 2, 3, 4}


# ---------------------------------------------------------------------------
# Batch 5: CDF partition-predicate parity over the reference's cdf-table
# (load_cdf.rs cdf_partition_predicate_* — the partition column moves
# across versions, so pruning must respect per-version partitionValues
# while the residual predicate filters rows)
# ---------------------------------------------------------------------------


def _cdf_rows(spark, predicate):
    dt = DeltaTable(os.path.join(DATA, "cdf-table"), spark=spark)
    rows = dt.load_cdf(starting_version=0, predicate=predicate).collect()
    return sorted((r.id, r.name, str(r.birthday), r._change_type) for r in rows)


def test_batch5_cdf_predicate_cdc_partition(spark):
    """birthday=2023-12-23 keeps the v0 inserts and the v1 update
    preimages of ids 2/3/4 (load_cdf.rs:801-833)."""
    got = _cdf_rows(spark, "birthday = '2023-12-23'")
    want = sorted(
        (i, n, "2023-12-23", ct)
        for (i, n) in [(2, "Bob"), (3, "Dave"), (4, "Kate")]
        for ct in ("insert", "update_preimage")
    )
    assert got == want


def test_batch5_cdf_predicate_remove_fallback_partition(spark):
    """birthday=2023-12-29 exercises the Remove-action fallback: v3
    deletes id 7 via a bare Remove — pruning must keep that file so the
    delete row survives (load_cdf.rs:841-873)."""
    got = _cdf_rows(spark, "birthday = '2023-12-29'")
    want = sorted(
        [
            (5, "Emily", "2023-12-29", "update_postimage"),
            (6, "Carl", "2023-12-29", "update_postimage"),
            (7, "Dennis", "2023-12-29", "delete"),
            (7, "Dennis", "2023-12-29", "update_postimage"),
        ]
    )
    assert got == want


def test_batch5_cdf_predicate_matching_partition_rows(spark):
    """birthday=2023-12-25: exactly the three v0 inserts
    (load_cdf.rs:680-709)."""
    got = _cdf_rows(spark, "birthday = '2023-12-25'")
    want = sorted(
        [
            (8, "Claire", "2023-12-25", "insert"),
            (9, "Ada", "2023-12-25", "insert"),
            (10, "Borb", "2023-12-25", "insert"),
        ]
    )
    assert got == want


def test_batch5_cdf_predicate_is_null_returns_nothing(spark):
    """IS NULL on the fully-populated partition column returns no rows
    (load_cdf.rs:877-900)."""
    assert _cdf_rows(spark, "birthday IS NULL") == []


def test_batch5_cdf_predicate_in_list(spark):
    """IN over partition values keeps exactly the listed partitions'
    change rows (load_cdf.rs:902-941): the v0 insert of id 1 plus the
    v1 postimages (moved INTO 2023-12-22) and the 12-25 inserts."""
    got = _cdf_rows(spark, "birthday IN ('2023-12-22', '2023-12-25')")
    want = sorted(
        [
            (1, "Steve", "2023-12-22", "insert"),
            (2, "Bob", "2023-12-22", "update_postimage"),
            (3, "Dave", "2023-12-22", "update_postimage"),
            (4, "Kate", "2023-12-22", "update_postimage"),
            (8, "Claire", "2023-12-25", "insert"),
            (9, "Ada", "2023-12-25", "insert"),
            (10, "Borb", "2023-12-25", "insert"),
        ]
    )
    assert got == want


def test_batch5_cdf_mixed_predicate(spark):
    """A mixed partition+data predicate prunes on the partition part
    only; the data conjunct filters rows (load_cdf.rs:1020-1060)."""
    got = _cdf_rows(spark, "birthday = '2023-12-24' AND id > 5")
    want = sorted(
        (i, n, "2023-12-24", ct)
        for (i, n) in [(6, "Carl"), (7, "Dennis")]
        for ct in ("insert", "update_preimage")
    )
    assert got == want


def test_batch5_cdf_non_partition_predicate_rows(spark):
    """id > 5 must not drop change rows from any partition — file-level
    stats can't prune CDF files, correctness comes from the row filter
    (load_cdf.rs:1062-1105)."""
    got = _cdf_rows(spark, "id > 5")
    # every change row of ids 6..10 across all five versions
    want = sorted(
        [
            (6, "Carl", "2023-12-24", "insert"),
            (7, "Dennis", "2023-12-24", "insert"),
            (8, "Claire", "2023-12-25", "insert"),
            (9, "Ada", "2023-12-25", "insert"),
            (10, "Borb", "2023-12-25", "insert"),
            (6, "Carl", "2023-12-24", "update_preimage"),
            (6, "Carl", "2023-12-29", "update_postimage"),
            (7, "Dennis", "2023-12-24", "update_preimage"),
            (7, "Dennis", "2023-12-29", "update_postimage"),
            (7, "Dennis", "2023-12-29", "delete"),
        ]
    )
    assert got == want


def test_batch6_get_files_partition_filters(spark):
    """files()/file_uris() DNF partition filters over the reference's
    delta-0.8.0-partitioned fixture reproduce its pinned file sets and
    validation errors (test_table_read.py
    test_get_files_partitioned_table). NOT IN was silently ignored
    before r12 session 2 — files() now evaluates DNF tuples exactly
    instead of routing through the scan pruner's conservative keeps."""
    from delta_rs_spark.log.commit import DeltaError

    dt = DeltaTable(os.path.join(DATA, "delta-0.8.0-partitioned"))
    day = lambda p: p.split("day=")[1].split("/")[0]

    assert [day(p) for p in dt.files([("day", "=", "3")])] == ["3"]
    assert [day(p) for p in dt.files([("day", "=", 3)])] == ["3"]
    assert sorted(day(p) for p in dt.files([("day", "!=", "3")])) == [
        "1", "20", "4", "5", "5"
    ]
    assert sorted(day(p) for p in dt.files([("day", "in", ["3", "20"])])) == [
        "20", "3"
    ]
    assert sorted(
        day(p) for p in dt.files([("day", "not in", ["3", "20"])])
    ) == ["1", "4", "5", "5"]
    two = dt.files([("day", "not in", ["3", "20"]), ("year", "=", "2021")])
    assert sorted(day(p) for p in two) == ["4", "5"]

    with pytest.raises(DeltaError, match="Invalid partition filter"):
        dt.file_uris([("x", "=>", "3")])
    with pytest.raises(DeltaError, match="Invalid partition filter"):
        dt.file_uris([("x", "=", ["3", "20"])])
    with pytest.raises(DeltaError, match="not a root table field"):
        dt.file_uris([("unknown", "=", "3")])
    with pytest.raises(DeltaError, match="not a partition column"):
        dt.file_uris([("value", "=", "3")])


# ---------------------------------------------------------------------------
# Batch 7: the last two corpus tables — the golden reader fixture and
# the metadata-cleaned CDF table (checkpoints_tombstones is an empty
# runtime-generated placeholder; DAT data requires a download)


def test_batch7_golden_array_primitives(spark):
    """The reference's golden reader fixture (test_utils/mod.rs:120
    TestTables::Golden, read.rs read_golden): version 0, protocol
    (1, 2), arrays of every primitive element type — int/long/byte/
    short/boolean/float/double/string/binary/decimal(1,0) — read with
    the exact element types and values."""
    dt = DeltaTable(
        os.path.join(DATA, "golden/data-reader-array-primitives"), spark=spark
    )
    assert dt.version() == 0
    p = dt.protocol()
    assert (p.min_reader_version, p.min_writer_version) == (1, 2)
    df = dt.to_df()
    want_elems = {
        "as_array_int": T.IntegerType(),
        "as_array_long": T.LongType(),
        "as_array_byte": T.ByteType(),
        "as_array_short": T.ShortType(),
        "as_array_boolean": T.BooleanType(),
        "as_array_float": T.FloatType(),
        "as_array_double": T.DoubleType(),
        "as_array_string": T.StringType(),
        "as_array_binary": T.BinaryType(),
        "as_array_big_decimal": T.DecimalType(1, 0),
    }
    got = {f.name: f.dataType.elementType for f in df.schema.fields}
    assert got == want_elems
    rows = sorted(df.collect(), key=lambda r: r.as_array_int)
    assert len(rows) == 10
    for i, r in enumerate(rows):
        assert r.as_array_int == [i]
        assert r.as_array_long == [i]
        assert r.as_array_string == [str(i)]
        assert r.as_array_boolean == [i % 2 == 0]
        assert float(r.as_array_float[0]) == float(i)
        assert int(r.as_array_big_decimal[0]) == i


# the reference's pinned 13-row feed for the metadata-cleaned table
# (load_cdf.rs test_load_vacuumed_table): versions 0-2 are cleaned,
# the checkpoint at v3 is the only metadata carrier, and v3's delete
# ships as a cdc file
_B7_CDF_EXPECTED = [
    (7, "Dennis", "2023-12-29", "delete", 3, "2024-01-06 16:44:59.570000"),
    (11, "Ossama", "2024-12-30", "insert", 4, "2025-01-06 16:33:18.167000"),
    (12, "Nick", "2023-12-29", "insert", 4, "2025-01-06 16:33:18.167000"),
    (13, "Ryan", "2023-12-22", "insert", 4, "2025-01-06 16:33:18.167000"),
    (14, "Zach", "2023-12-25", "insert", 4, "2025-01-06 16:33:18.167000"),
    (11, "Ossama", "2024-12-30", "update_preimage", 5, "2025-01-06 16:38:19.623000"),
    (12, "Ossama", "2024-12-30", "update_postimage", 5, "2025-01-06 16:38:19.623000"),
    (12, "Nick", "2023-12-29", "update_preimage", 5, "2025-01-06 16:38:19.623000"),
    (13, "Nick", "2023-12-29", "update_postimage", 5, "2025-01-06 16:38:19.623000"),
    (13, "Ryan", "2023-12-22", "update_preimage", 5, "2025-01-06 16:38:19.623000"),
    (14, "Ryan", "2023-12-22", "update_postimage", 5, "2025-01-06 16:38:19.623000"),
    (14, "Zach", "2023-12-25", "update_preimage", 5, "2025-01-06 16:38:19.623000"),
    (15, "Zach", "2023-12-25", "update_postimage", 5, "2025-01-06 16:38:19.623000"),
]


def _b7_rows(cdf_df):
    return sorted(
        (r.id, r.name, str(r.birthday), r._change_type, r._commit_version,
         str(r._commit_timestamp))
        for r in cdf_df.collect()
    )


def test_batch7_vacuumed_cdf_starting_timestamp(spark):
    """load_cdf with a starting_timestamp BELOW the checkpoint floor's
    commit on a metadata-cleaned table must serve the reference's
    pinned 13 rows (load_cdf.rs:1383-1420 test_load_vacuumed_table) —
    before r12 session 3 this returned an EMPTY feed because the empty
    in-memory base never saw a metaData action (it lives only in the
    checkpoint)."""
    dt = DeltaTable(os.path.join(DATA, "checkpoint-cdf-table"), spark=spark)
    got = _b7_rows(dt.load_cdf(starting_timestamp="2024-01-06T15:44:59.570+00:00"))
    assert got == sorted(_B7_CDF_EXPECTED)


def test_batch7_vacuumed_cdf_starting_version_at_floor(spark):
    """load_cdf(starting_version=3) on the same table crashed before
    r12 session 3: the base-snapshot load at version 2 replayed commit
    JSONs that metadata cleanup deleted. The checkpoint floor now
    seeds the base; the floor version's own actions re-apply
    idempotently and its cdc file still ships the delete."""
    dt = DeltaTable(os.path.join(DATA, "checkpoint-cdf-table"), spark=spark)
    got = _b7_rows(dt.load_cdf(starting_version=3))
    assert got == sorted(_B7_CDF_EXPECTED)
    # range bounds still compose with the floor: v4..v4 only
    only_v4 = dt.load_cdf(starting_version=4, ending_version=4)
    assert _b7_rows(only_v4) == sorted(
        r for r in _B7_CDF_EXPECTED if r[4] == 4
    )


def test_batch7_vacuumed_cdf_ending_timestamp_at_floor(spark):
    """An ending_timestamp equal to the floor commit's own ts keeps
    exactly the floor version (inclusive bound) even though every
    earlier commit is cleaned."""
    dt = DeltaTable(os.path.join(DATA, "checkpoint-cdf-table"), spark=spark)
    upto = dt.load_cdf(ending_timestamp="2024-01-06T16:44:59.570+00:00")
    assert _b7_rows(upto) == sorted(r for r in _B7_CDF_EXPECTED if r[4] == 3)
