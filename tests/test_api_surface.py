"""deltalake-API-compat surface: QueryBuilder, pandas/arrow input,
pyarrow output, DNF partition filters (reference: python/deltalake API)."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from delta_rs_spark import DeltaTable, QueryBuilder, write_deltalake


def test_querybuilder_multi_table(spark, tmp_path, sample_df, lineitem):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_deltalake(p1, sample_df)
    write_deltalake(p2, lineitem.limit(100))
    qb = (
        QueryBuilder(spark)
        .register("biz", DeltaTable(p1))
        .register("li", DeltaTable(p2))
    )
    rows = qb.execute(
        "SELECT count(*) AS n FROM biz CROSS JOIN (SELECT DISTINCT l_returnflag FROM li)"
    ).collect()
    assert rows[0].n % 5 == 0 and rows[0].n > 0


def test_write_from_pandas_and_arrow(spark, tmp_path):
    p = str(tmp_path / "pdtab")
    pdf = pd.DataFrame({"id": [1, 2, 3], "name": ["a", "b", "c"]})
    write_deltalake(p, pdf, spark=spark)
    t = DeltaTable(p)
    assert t.count() == 3
    tbl = pa.table({"id": [4, 5], "name": ["d", "e"]})
    write_deltalake(p, tbl, spark=spark, mode="append")
    t.refresh()
    assert t.count() == 5


def test_arrow_unsigned_safe_cast(spark, tmp_path):
    """Delta has no unsigned types: uint8 input narrows to BYTE at the
    same width (reference python/tests/test_casting.py test_safe_cast),
    and integer widths are preserved through ingest (int8 stays BYTE,
    not widened to LONG by a pandas round-trip)."""
    import pyspark.sql.types as T

    p = str(tmp_path / "uint_safe")
    write_deltalake(p, pa.table({"foo": pa.array([1, 2, 3, 4], pa.uint8())}),
                    spark=spark)
    t = DeltaTable(p, spark=spark)
    assert isinstance(t.schema()["foo"].dataType, T.ByteType)
    assert sorted(r.foo for r in t.to_df().collect()) == [1, 2, 3, 4]

    p2 = str(tmp_path / "widths")
    write_deltalake(
        p2,
        pa.table({
            "b": pa.array([1], pa.int8()),
            "s": pa.array([1], pa.uint16()),
            "i": pa.array([1], pa.uint32()),
            "nested": pa.array([[1, 2]], pa.list_(pa.uint8())),
        }),
        spark=spark,
    )
    sch = DeltaTable(p2, spark=spark).schema()
    assert isinstance(sch["b"].dataType, T.ByteType)
    assert isinstance(sch["s"].dataType, T.ShortType)
    assert isinstance(sch["i"].dataType, T.IntegerType)
    assert isinstance(sch["nested"].dataType.elementType, T.ByteType)


def test_arrow_unsigned_unsafe_cast_rejected(spark, tmp_path):
    """uint8 value 200 does not fit Int8 — the write must FAIL with a
    cast error, not silently widen or wrap (reference
    python/tests/test_casting.py test_unsafe_cast)."""
    from delta_rs_spark.log.commit import DeltaError

    with pytest.raises(DeltaError, match="Cast error"):
        write_deltalake(
            str(tmp_path / "uint_unsafe"),
            pa.table({"foo": pa.array([1, 2, 3, 200], pa.uint8())}),
            spark=spark,
        )


def test_to_pyarrow_table(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    tbl = DeltaTable(tmp_table).to_pyarrow_table(columns=["id", "price"])
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 5 and tbl.column_names == ["id", "price"]


def test_dnf_partition_filters(spark, tmp_table, lineitem):
    write_deltalake(tmp_table, lineitem, partition_by=["l_returnflag"])
    t = DeltaTable(tmp_table)
    files_in = t.files([("l_returnflag", "in", ["A", "N"])])
    files_eq = t.files([("l_returnflag", "=", "A")])
    assert set(files_eq) < set(files_in)
    # disjunction of conjunctions
    df = t.to_df(partition_filters=[[("l_returnflag", "=", "A")], [("l_returnflag", "=", "N")]])
    assert df.select("l_returnflag").distinct().count() == 2


def test_count_and_schema_api(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    t = DeltaTable(tmp_table)
    assert t.count() == 5
    assert [f.name for f in t.schema().fields] == ["id", "price", "sold", "deleted"]
    assert t.protocol().min_reader_version == 1
    assert t.metadata().partition_columns == []


# ---- round-2 API parity additions -----------------------------------------


def test_vacuum_keep_versions(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)                      # v0
    write_deltalake(tmp_table, sample_df, mode="overwrite")    # v1 tombstones v0
    t = DeltaTable(tmp_table)
    would_delete = t.vacuum(retention_hours=0, enforce_retention_duration=False)
    assert would_delete  # v0 files are reclaimable
    kept = t.vacuum(
        retention_hours=0, enforce_retention_duration=False, keep_versions=[0]
    )
    assert kept == []  # every candidate belongs to the protected version
    # destructive vacuum honoring keep_versions leaves v0 readable
    t.vacuum(
        retention_hours=0,
        dry_run=False,
        enforce_retention_duration=False,
        keep_versions=[0],
    )
    assert DeltaTable(tmp_table, version=0).to_df().count() == 5


def test_create_write_transaction(spark, tmp_table, sample_df):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    write_deltalake(tmp_table, sample_df)
    t = DeltaTable(tmp_table)
    # produce a file OUTSIDE the engine, then commit it
    extra = pa.table({"id": ["x1", "x2"], "price": [10.0, 20.0]})
    fname = "part-external-0001.snappy.parquet"
    pq.write_table(extra, os.path.join(tmp_table, fname))
    v = t.create_write_transaction(
        [
            {
                "path": fname,
                "size": os.path.getsize(os.path.join(tmp_table, fname)),
                "stats": '{"numRecords": 2}',
            }
        ],
        mode="append",
    )
    assert v == 1
    assert t.count() == 7
    assert t.to_df().filter("id = 'x1'").count() == 1
    # schema guard
    import pytest as _pytest
    from pyspark.sql import types as T

    with _pytest.raises(Exception):
        t.create_write_transaction(
            [{"path": fname, "size": 1}],
            schema=T.StructType([T.StructField("other", T.StringType())]),
        )


def test_update_incremental(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    stale = DeltaTable(tmp_table)
    write_deltalake(tmp_table, sample_df, mode="append")
    assert stale.version() == 0
    stale.update_incremental()
    assert stale.version() == 1 and stale.count() == 10


def test_to_pyarrow_table_native(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    tbl = DeltaTable(tmp_table).to_pyarrow_table()
    assert tbl.num_rows == 5
    assert {"id", "price"} <= set(tbl.column_names)


def test_to_pyarrow_dataset_pruned(spark, tmp_table):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "v long, part string"
    )
    write_deltalake(tmp_table, df, partition_by=["part"])
    t = DeltaTable(tmp_table)
    ds = t.to_pyarrow_dataset(partition_filters=[("part", "=", "a")])
    got = ds.to_table()
    assert got.num_rows == 2
    assert set(got.column_names) >= {"v", "part"}


def test_schema_mirror_classes(spark, tmp_table):
    from delta_rs_spark import ArrayType, Field, MapType, PrimitiveType, Schema
    from delta_rs_spark.schema import from_spark, to_spark
    from pyspark.sql import types as T

    spark_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False, {"delta.columnMapping.id": 1}),
            T.StructField("d", T.DecimalType(10, 2)),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("kv", T.MapType(T.StringType(), T.DoubleType())),
            T.StructField(
                "nested",
                T.StructType([T.StructField("x", T.IntegerType())]),
            ),
        ]
    )
    s = from_spark(spark_schema)
    assert isinstance(s, Schema)
    assert s.fields[0] == Field("id", PrimitiveType("long"), False, {"delta.columnMapping.id": 1})
    assert s.fields[1].type == PrimitiveType("decimal(10,2)")
    assert s.fields[2].type == ArrayType(PrimitiveType("string"))
    assert s.fields[3].type == MapType(PrimitiveType("string"), PrimitiveType("double"))
    assert to_spark(s) == spark_schema
    # JSON round trip (the protocol wire format)
    assert Schema.from_json(s.to_json()) == s

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    write_deltalake(tmp_table, df)
    ds = DeltaTable(tmp_table).delta_schema()
    assert [f.name for f in ds.fields] == ["id", "name"]
    assert ds.fields[1].type == PrimitiveType("string")


def test_commit_properties_custom_metadata_and_txn(spark, tmp_path):
    """CommitProperties parity (reference transaction.py:48-77):
    custom_metadata lands in commitInfo (userMetadata promoted to the
    protocol string field), app_transactions append txn watermarks."""
    import json
    import os

    from delta_rs_spark import CommitProperties, DeltaTable, write_deltalake

    t = str(tmp_path / "cp")
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    cp = CommitProperties(
        custom_metadata={"userMetadata": "batch-42", "pipelineRun": "r7"},
        app_transactions=[("etl-app", 42)],
    )
    write_deltalake(t, df, commit_properties=cp)
    commit = [
        json.loads(line)
        for line in open(os.path.join(t, "_delta_log", "00000000000000000000.json"))
    ]
    ci = next(d["commitInfo"] for d in commit if "commitInfo" in d)
    assert ci["userMetadata"] == "batch-42"
    assert ci["pipelineRun"] == "r7"
    txns = [d["txn"] for d in commit if "txn" in d]
    assert {(x["appId"], x["version"]) for x in txns} == {("etl-app", 42)}
    dt = DeltaTable(t)
    assert dt.transaction_version("etl-app") == 42
    # history surfaces the metadata
    h = dt.history(1)[0]
    assert h.get("userMetadata") == "batch-42"


def test_commit_properties_rejects_generated_keys():
    import pytest as _pytest

    from delta_rs_spark import CommitProperties

    with _pytest.raises(ValueError):
        CommitProperties(custom_metadata={"timestamp": 1})
    with _pytest.raises(ValueError):
        CommitProperties(custom_metadata={"x": float("nan")})


def test_writer_properties_compression(spark, tmp_path):
    """WriterProperties.compression reaches the parquet files on disk."""
    import pyarrow.parquet as pq

    from delta_rs_spark import DeltaTable, WriterProperties, write_deltalake

    t = str(tmp_path / "wp")
    df = spark.range(100).selectExpr("id", "concat('v', id) AS s")
    write_deltalake(t, df, writer_properties=WriterProperties(compression="ZSTD"))
    dt = DeltaTable(t)
    f = dt.file_uris()[0]
    meta = pq.ParquetFile(f).metadata
    assert meta.row_group(0).column(0).compression == "ZSTD"
    assert [r.id for r in dt.to_df().select("id").orderBy("id").collect()] == list(range(100))


def test_writer_properties_rejects_bad_codec():
    import pytest as _pytest

    from delta_rs_spark import WriterProperties

    with _pytest.raises(ValueError):
        WriterProperties(compression="LZMA")


def test_target_file_size_splits_output(spark, tmp_path):
    """target_file_size (bytes) must split a write into multiple files
    sized in the right ballpark."""
    from delta_rs_spark import DeltaTable, write_deltalake

    t = str(tmp_path / "tfs")
    # ~100 KB of incompressible-ish data
    df = spark.range(2000).selectExpr("id", "sha2(cast(id AS string), 256) AS payload").coalesce(1)
    write_deltalake(t, df, target_file_size=16 * 1024)
    dt = DeltaTable(t)
    files = dt.files()
    assert len(files) >= 3
    assert dt.to_df().count() == 2000


def test_post_commithook_skip_checkpoint(spark, tmp_path):
    """create_checkpoint=False suppresses the interval checkpoint hook."""
    import os

    from delta_rs_spark import DeltaTable, PostCommitHookProperties, write_deltalake

    t = str(tmp_path / "pch")
    df = spark.range(3).selectExpr("id")
    write_deltalake(t, df, configuration={"delta.checkpointInterval": "2"})
    ph = PostCommitHookProperties(create_checkpoint=False)
    for _ in range(4):
        write_deltalake(t, df, mode="append", post_commithook_properties=ph)
    log = os.listdir(os.path.join(t, "_delta_log"))
    assert not [f for f in log if f.endswith(".checkpoint.parquet")]
    # and with the default hook a checkpoint appears
    write_deltalake(t, df, mode="append")
    write_deltalake(t, df, mode="append")
    log = os.listdir(os.path.join(t, "_delta_log"))
    assert [f for f in log if f.endswith(".checkpoint.parquet")]
    assert DeltaTable(t).to_df().count() == 21


def test_delete_with_commit_properties(spark, tmp_path):
    from delta_rs_spark import CommitProperties, DeltaTable, write_deltalake

    t = str(tmp_path / "delcp")
    write_deltalake(t, spark.range(10).selectExpr("id", "id % 2 AS k"))
    dt = DeltaTable(t)
    dt.delete(
        "k = 1",
        commit_properties=CommitProperties(custom_metadata={"userMetadata": "purge"}),
    )
    assert dt.history(1)[0].get("userMetadata") == "purge"
    assert dt.to_df().count() == 5


def test_table_features_enum_and_add_feature(spark, tmp_path, sample_df):
    """TableFeatures mirrors the reference enum (python/src/features.rs);
    add_feature accepts members and records protocol feature names."""
    from delta_rs_spark import DeltaTable, TableFeatures, write_deltalake

    assert TableFeatures.DeletionVectors.value == "DeletionVectors"
    table = str(tmp_path / "feat")
    write_deltalake(table, sample_df)
    t = DeltaTable(table)
    t.alter.add_feature([TableFeatures.ChangeDataFeed, "domainMetadata"])
    t.refresh()
    p = t.protocol()
    assert "changeDataFeed" in (p.writer_features or [])
    assert "domainMetadata" in (p.writer_features or [])


def test_transaction_object_in_commit_properties(spark, tmp_path, sample_df):
    from delta_rs_spark import (
        CommitProperties,
        DeltaTable,
        Transaction,
        write_deltalake,
    )

    table = str(tmp_path / "txnobj")
    write_deltalake(table, sample_df)
    t = DeltaTable(table)
    t.delete(
        "price = 0",
        commit_properties=CommitProperties(
            app_transactions=[Transaction(app_id="etl", version=7)]
        ),
    )
    t.refresh()
    assert t.transaction_version("etl") == 7


def test_version_and_datatype_exports():
    import delta_rs_spark as d

    assert isinstance(d.__version__, str)
    assert d.DataType is not None
    assert isinstance(d.Metadata, type)


def test_without_files_mode(spark, tmp_path, sample_df):
    """Reference parity: DeltaTable(uri, without_files=True) serves
    metadata but refuses file-list APIs."""
    from delta_rs_spark.log.commit import DeltaError

    table = str(tmp_path / "nofiles")
    write_deltalake(table, sample_df)
    t = DeltaTable(table, without_files=True, storage_options={"k": "v"})
    assert t.version() == 0
    assert t.metadata() is not None
    assert len(t.schema().fields) == 4
    with pytest.raises(DeltaError):
        t.files()
    with pytest.raises(DeltaError):
        t.file_uris()


def test_create_with_mirror_schema_and_feature_protocol(spark, tmp_path):
    """Reference parity (test_create_schema_with_variant_type,
    test_create_with_deletion_vectors_enabled): create() accepts the
    deltalake-style mirror Schema, and a variant column / DV config
    surfaces the required protocol features."""
    from delta_rs_spark import Field, PrimitiveType, Schema, VariantType

    t1 = str(tmp_path / "variant_tbl")
    dt = DeltaTable.create(
        t1, Schema([Field("id", PrimitiveType("long")), Field("payload", VariantType())])
    )
    assert isinstance(dt.delta_schema().fields[1].type, VariantType)
    p = dt.protocol()
    assert p.min_reader_version == 3 and p.min_writer_version == 7
    assert "variantType" in p.reader_features
    # our own reader accepts the variantType feature (Spark 4 native)
    assert DeltaTable(t1).version() == 0

    t2 = str(tmp_path / "dv_tbl")
    dt2 = DeltaTable.create(
        t2,
        Schema([Field("id", PrimitiveType("long"))]),
        configuration={"delta.enableDeletionVectors": "true"},
    )
    assert "deletionVectors" in dt2.protocol().reader_features


def test_reference_all_subset_of_exports():
    """Every name in the reference's public __all__
    (python/deltalake/__init__.py:140-161) must exist in this package
    (get_spark and the richer schema/error surface are allowed extras)."""
    import delta_rs_spark as pkg

    reference_all = [
        "BloomFilterProperties",
        "ColumnProperties",
        "CommitProperties",
        "DataType",
        "DeltaTable",
        "Field",
        "Metadata",
        "PostCommitHookProperties",
        "QueryBuilder",
        "Schema",
        "TableFeatures",
        "Transaction",
        "VariantType",
        "WriterProperties",
        "__version__",
        "convert_to_deltalake",
        "enable_nanosecond_timestamps",
        "init_tracing",
        "rust_core_version",
        "write_deltalake",
    ]
    missing = [n for n in reference_all if not hasattr(pkg, n)]
    assert missing == []
    assert set(reference_all) - {"DataType", "__version__"} <= set(pkg.__all__)


def test_runtime_stub_semantics():
    import delta_rs_spark as pkg

    assert pkg.rust_core_version().startswith("pyspark-")
    pkg.init_tracing()  # no-op
    pkg.init_tracing("http://localhost:4318/v1/traces")
    with pytest.raises(TypeError):
        pkg.init_tracing(123)
    # Spark SQL is µs-precision: the toggle must refuse, like the
    # reference's non-nanos build does, and the probe must stay False.
    with pytest.raises(RuntimeError):
        pkg.enable_nanosecond_timestamps()
    assert pkg._nanosecond_timestamps_enabled() is False


def test_exceptions_module_parity(spark, tmp_path):
    """deltalake.exceptions parity: module path, names, and live raise
    sites (reference python/deltalake/exceptions.py)."""
    from delta_rs_spark import exceptions as exc

    for n in ("CommitFailedError", "DeltaError", "DeltaProtocolError",
              "SchemaMismatchError", "TableNotFoundError"):
        assert hasattr(exc, n), n
    # live site: missing table raises TableNotFoundError (and stays
    # catchable as FileNotFoundError for pre-module callers)
    with pytest.raises(exc.TableNotFoundError):
        DeltaTable(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        DeltaTable(str(tmp_path / "nope"))
    # live site: unreadable protocol raises DeltaProtocolError
    import json, os
    p = str(tmp_path / "hi_proto")
    write_deltalake(p, pd.DataFrame({"id": [1]}))
    log = os.path.join(p, "_delta_log", "00000000000000000001.json")
    with open(log, "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 9, "minWriterVersion": 9}}) + "\n")
    with pytest.raises(exc.DeltaProtocolError):
        DeltaTable(p)

    from delta_rs_spark.warnings import ExperimentalWarning
    assert issubclass(ExperimentalWarning, Warning)


def test_delta_storage_handler(spark, tmp_path, sample_df):
    """deltalake.fs.DeltaStorageHandler parity: a pyarrow PyFileSystem
    over the table root reads the snapshot's files by relative path."""
    import pyarrow.parquet as pqt
    from pyarrow.fs import PyFileSystem, FileType

    from delta_rs_spark.fs import DeltaStorageHandler

    p = str(tmp_path / "fstab")
    write_deltalake(p, sample_df)
    t = DeltaTable(p)
    fs = PyFileSystem(DeltaStorageHandler(p))
    total = 0
    for rel in t.files():  # add.path entries, relative to table root
        info = fs.get_file_info([rel])[0]
        assert info.type == FileType.File and info.size > 0
        total += pqt.read_table(rel, filesystem=fs).num_rows
    assert total == t.count()
    # known_sizes short-circuits the stat call, like the reference
    fs2 = PyFileSystem(DeltaStorageHandler(p, known_sizes={"ghost.parquet": 7}))
    assert fs2.get_file_info(["ghost.parquet"])[0].size == 7
    # from_table + selector listing
    h = DeltaStorageHandler.from_table(t)
    names = [i.base_name for i in PyFileSystem(h).get_file_info(
        __import__("pyarrow").fs.FileSelector(p, recursive=True))]
    assert any(n.endswith(".parquet") for n in names)
    with pytest.raises(NotImplementedError):
        h.open_append_stream("x", {})


def test_foreign_uri_schemes_rejected_clearly(spark, tmp_path):
    """r10: an object-store URI used to fall through the file:-strip
    and be treated as a RELATIVE LOCAL PATH (creating a directory
    literally named 's3:'). Every table-path entry point must reject
    foreign schemes with a clear error pointing at the Spark/Hadoop
    filesystem layer; file: URIs and bare paths still work."""
    import pytest

    from delta_rs_spark import DeltaTable, clone_table, write_deltalake
    from delta_rs_spark.log.commit import DeltaError
    from delta_rs_spark.operators.convert import convert_to_deltalake

    df = spark.range(3).toDF("id")
    for uri in ("s3://bucket/tbl", "s3a://bucket/tbl", "abfss://c@a.dfs.core.windows.net/t",
                "gs://bucket/tbl", "hdfs://nn/tbl"):
        with pytest.raises(DeltaError, match="scheme"):
            write_deltalake(uri, df)
        with pytest.raises(DeltaError, match="scheme"):
            DeltaTable(uri)
        with pytest.raises(DeltaError, match="scheme"):
            DeltaTable.is_deltatable(uri)
        with pytest.raises(DeltaError, match="scheme"):
            convert_to_deltalake(uri, spark=spark)
        with pytest.raises(DeltaError, match="scheme"):
            clone_table(uri, str(tmp_path / "d"))

    # file: URI and bare path keep working
    p = str(tmp_path / "ok")
    write_deltalake("file://" + p, df)
    assert DeltaTable("file://" + p).count() == 3
    assert DeltaTable(p).count() == 3


def test_file_uri_spellings_normalize_and_authority_rejected(spark, tmp_path):
    """r11 ADVICE: 'file:/x' — the single-slash spelling Spark's own
    Path.toUri emits — used to pass the '://'-only scheme regex
    verbatim and create a local directory literally named 'file:'; and
    'file://host/x' was mis-stripped to the RELATIVE path 'host/x'.
    Every file: spelling must normalize to the same local path, a
    non-empty authority must be rejected, and a single-slash foreign
    scheme ('s3:/b/t') must be rejected like the double-slash form."""
    import pytest

    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.log.commit import DeltaError
    from delta_rs_spark.operators.util import local_table_path

    p = str(tmp_path / "ok2")
    write_deltalake("file:" + p, spark.range(4).toDF("id"))
    assert not os.path.exists(os.path.join(os.getcwd(), "file:")), (
        "single-slash file: URI was treated as a relative path"
    )
    # all three spellings address the same table
    assert DeltaTable("file:" + p).count() == 4
    assert DeltaTable("file://" + p).count() == 4
    assert DeltaTable(p).count() == 4
    assert local_table_path("file:" + p) == p
    assert local_table_path("file://" + p) == p
    assert local_table_path("file:///" + p.lstrip("/")) == p

    with pytest.raises(DeltaError, match="authority"):
        DeltaTable("file://somehost/tmp/x")
    with pytest.raises(DeltaError, match="scheme"):
        DeltaTable("s3:/bucket/tbl")
    # a slashless colon name is a legal posix filename, not a URI
    assert local_table_path("a:b") == "a:b"


def test_commit_properties_json_values_round_trip(spark, tmp_path):
    """custom_metadata carries arbitrary JSON VALUES (not just strings)
    verbatim into commitInfo and back out of history() (reference
    test_commit_properties.py test_custom_metadata_json_values_round_
    trip); clientVersion can be overridden and is preserved."""
    import json

    from delta_rs_spark import CommitProperties, DeltaTable, write_deltalake

    t = str(tmp_path / "cpjson")
    df = spark.range(1).selectExpr("cast(id as string) AS id", "id + 10 AS price")
    write_deltalake(
        t,
        df,
        commit_properties=CommitProperties(
            custom_metadata={
                "intValue": 7,
                "nested": {"flag": True, "items": [1, None, {"name": "value"}]},
                "boolValue": False,
                "nullValue": None,
                "clientVersion": "test-client.1.2.3",
            }
        ),
    )
    h = DeltaTable(t).history(1)[0]
    assert h["intValue"] == 7
    assert h["nested"] == {"flag": True, "items": [1, None, {"name": "value"}]}
    assert h["boolValue"] is False
    assert h["nullValue"] is None
    assert h["clientVersion"] == "test-client.1.2.3"
    raw = [
        json.loads(line)
        for line in open(os.path.join(t, "_delta_log", "00000000000000000000.json"))
    ]
    ci = next(d["commitInfo"] for d in raw if "commitInfo" in d)
    assert ci["intValue"] == 7
    assert ci["clientVersion"] == "test-client.1.2.3"


def test_commit_properties_operation_parameters_merge(spark, tmp_path):
    """A custom operationParameters OBJECT merges UNDER the operation's
    own parameters — generated keys win, custom values are stringified,
    and the raw commitInfo JSON carries no duplicate keys (reference
    test_operation_parameters_merge_without_duplicate_json_keys)."""
    import json

    from delta_rs_spark import CommitProperties, DeltaTable, write_deltalake

    def _reject_dups(pairs):
        out = {}
        for k, v in pairs:
            assert k not in out, f"duplicate JSON key: {k}"
            out[k] = v
        return out

    t = str(tmp_path / "cpmerge")
    df = spark.range(1).selectExpr("cast(id as string) AS id", "id + 10 AS price")
    write_deltalake(
        t,
        df,
        mode="overwrite",
        partition_by=["id"],
        commit_properties=CommitProperties(
            custom_metadata={
                "operationParameters": {
                    "mode": "custom-mode",
                    "partitionBy": "custom-partitioning",
                    "customParameter": {"from": "metadata"},
                    "customBoolean": True,
                    "customNumber": 7,
                }
            }
        ),
    )
    h = DeltaTable(t).history(1)[0]
    op = h["operationParameters"]
    assert op["mode"] != "custom-mode"  # the operation's own value wins
    assert op["partitionBy"] == '["id"]'
    assert op["customParameter"] == '{"from":"metadata"}'
    assert op["customBoolean"] == "true"
    assert op["customNumber"] == "7"
    raw_lines = open(
        os.path.join(t, "_delta_log", "00000000000000000000.json")
    ).read().splitlines()
    for line in raw_lines:  # duplicate-key scan over the raw JSON
        json.loads(line, object_pairs_hook=_reject_dups)


def test_commit_properties_reserved_key_validation(spark, tmp_path):
    """Reserved commitInfo keys are validated by type (reference
    test_invalid_reserved_custom_metadata_values_raise /
    test_invalid_custom_metadata_json_values_raise), while userName/
    userId/readVersion with VALID shapes pass through to history."""
    import math

    from delta_rs_spark import CommitProperties, DeltaTable, write_deltalake

    cases = [
        ({"operationParameters": "not-an-object"}, "operationParameters"),
        ({"readVersion": -1}, "readVersion"),
        ({"readVersion": 1.0}, "readVersion"),
        ({"readVersion": "1"}, "readVersion"),
        ({"readVersion": True}, "readVersion"),
        ({"isolationLevel": "NotAnIsolationLevel"}, "isolationLevel"),
        ({"userName": 123}, "userName"),
        ({"timestamp": 123}, "timestamp"),
        ({"operation": "WRITE"}, "operation"),
        ({"engineInfo": "custom-engine"}, "engineInfo"),
    ]
    for md, match in cases:
        with pytest.raises(ValueError, match=match):
            CommitProperties(custom_metadata=md)
    with pytest.raises(ValueError, match="mapping"):
        CommitProperties(custom_metadata=[("key", "value")])
    with pytest.raises(ValueError, match="keys must be strings"):
        CommitProperties(custom_metadata={1: "value"})
    with pytest.raises(ValueError, match="JSON"):
        CommitProperties(custom_metadata={"score": math.nan})
    with pytest.raises(ValueError, match="JSON"):
        CommitProperties(custom_metadata={"payload": object()})
    # valid reserved user fields flow through
    t = str(tmp_path / "cpreserved")
    df = spark.range(1).selectExpr("cast(id as string) AS id", "id + 10 AS price")
    write_deltalake(
        t,
        df,
        commit_properties=CommitProperties(
            custom_metadata={"userName": "Jane Doe", "userId": "jane"}
        ),
    )
    h = DeltaTable(t).history(1)[0]
    assert h["userName"] == "Jane Doe"
    assert h["userId"] == "jane"


def test_history_versions_stable_from_filenames(spark, tmp_path):
    """history() derives each entry's version from the commit FILENAME,
    so a writer landing mid-call can never shift every version (the
    reference's issue #4488, pinned by its
    test_history_versions_are_stable_under_concurrent_write)."""
    from delta_rs_spark import CommitProperties, DeltaTable, write_deltalake

    t = str(tmp_path / "hstable")
    df = spark.range(2).selectExpr("cast(id as string) AS id", "id AS price")
    for _ in range(3):
        write_deltalake(t, df, mode="overwrite")
    dt = DeltaTable(t)
    h = dt.history()
    assert [e["version"] for e in h] == [2, 1, 0]
    # entries keep their versions even after a commit lands afterwards
    write_deltalake(t, df, mode="overwrite")
    assert [e["version"] for e in dt.history()][1:] == [2, 1, 0]
    for e in h:
        assert e["operation"] in ("WRITE", "CREATE TABLE AS SELECT", "CREATE OR REPLACE TABLE AS SELECT")
