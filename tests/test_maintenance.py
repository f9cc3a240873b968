"""OPTIMIZE/VACUUM/RESTORE/FSCK/ALTER/CONVERT/GENERATE/checkpoint
(reference test model: python/tests/test_optimize.py, test_vacuum.py,
test_restore.py, test_constraint.py, test_checkpoint.py)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_rs_spark import DeltaTable, convert_to_deltalake, write_deltalake
from delta_rs_spark.log.commit import DeltaError


def test_optimize_compact(spark, tmp_table, sample_df):
    for _ in range(4):
        write_deltalake(tmp_table, sample_df, mode="append")
    t = DeltaTable(tmp_table)
    n_before = len(t.files())
    m = t.optimize.compact()
    assert m["numFilesRemoved"] == n_before and m["numFilesAdded"] >= 1
    assert len(t.files()) < n_before
    assert t.count() == 20  # data unchanged


def test_optimize_zorder(spark, tmp_table, lineitem):
    write_deltalake(tmp_table, lineitem.repartition(4))
    t = DeltaTable(tmp_table)
    n = t.count()
    m = t.optimize.z_order(["l_orderkey", "l_partkey"])
    assert m["numFilesAdded"] >= 1
    assert t.count() == n
    # z-ordered files should be selective on the leading column
    from delta_rs_spark.plans.skipping import prune_files

    adds = list(t._snapshot.files.values())
    if len(adds) > 1:
        kept = prune_files(adds, "l_orderkey < 100", [])
        assert len(kept) < len(adds)


def test_vacuum(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    write_deltalake(tmp_table, sample_df, mode="overwrite")
    t = DeltaTable(tmp_table)
    # files tombstoned just now: respect retention -> nothing deletable
    assert t.vacuum(dry_run=True) == []
    with pytest.raises(DeltaError):
        t.vacuum(retention_hours=0)  # below configured minimum
    cands = t.vacuum(retention_hours=0, dry_run=True, enforce_retention_duration=False)
    assert len(cands) >= 1
    deleted = t.vacuum(retention_hours=0, dry_run=False, enforce_retention_duration=False)
    for rel in deleted:
        assert not os.path.exists(os.path.join(tmp_table, rel))
    assert t.to_df().count() == 5  # active data intact


def test_restore(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    write_deltalake(tmp_table, sample_df.limit(1), mode="overwrite")
    t = DeltaTable(tmp_table)
    assert t.count() == 1
    m = t.restore(0)
    assert m["numRestoredFiles"] >= 1
    assert t.count() == 5
    hist = t.history(1)
    assert hist[0]["operation"] == "RESTORE"


def test_fsck_repair(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    write_deltalake(tmp_table, sample_df, mode="append")
    t = DeltaTable(tmp_table)
    victim = t.files()[0]
    os.unlink(os.path.join(tmp_table, victim))
    res = t.repair(dry_run=True)
    assert res["files_removed"] == [victim]
    res = t.repair()
    assert res["files_removed"] == [victim]
    assert victim not in t.files()
    t.to_df().count()  # scan works again


def test_constraints(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    t = DeltaTable(tmp_table)
    t.alter.add_constraint({"price_nonneg": "price >= 0"})
    with pytest.raises(DeltaError):
        t.alter.add_constraint({"impossible": "price > 100"})  # existing rows violate
    bad = spark.createDataFrame(
        [("9", -5, 0, False)], "id string, price long, sold int, deleted boolean"
    )
    with pytest.raises(DeltaError):
        write_deltalake(tmp_table, bad, mode="append")
    t.alter.drop_constraint("price_nonneg")
    write_deltalake(tmp_table, bad, mode="append")  # allowed now
    t.refresh()
    assert t.count() == 6


def test_add_columns_and_properties(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    t = DeltaTable(tmp_table)
    t.alter.add_columns([T.StructField("note", T.StringType())])
    assert "note" in [f.name for f in t.schema().fields]
    assert t.to_df().select("note").distinct().collect()[0][0] is None
    t.alter.set_table_properties({"delta.enableChangeDataFeed": "true"})
    assert t.metadata().configuration["delta.enableChangeDataFeed"] == "true"
    t.alter.set_table_name("mytable")
    t.alter.set_column_metadata("id", {"comment": "primary key"})
    assert t.metadata().name == "mytable"
    assert t.schema()["id"].metadata["comment"] == "primary key"


def test_checkpoint_roundtrip(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    for _ in range(3):
        write_deltalake(tmp_table, sample_df, mode="append")
    t = DeltaTable(tmp_table)
    t.create_checkpoint()
    # drop early commit JSONs; snapshot must still load from checkpoint
    n = t.cleanup_metadata(retention_hours=0)
    assert n >= 0
    t2 = DeltaTable(tmp_table)
    assert t2.count() == 20
    write_deltalake(tmp_table, sample_df, mode="append")
    assert DeltaTable(tmp_table).count() == 25


def test_convert_to_delta(spark, tmp_path, lineitem):
    raw = str(tmp_path / "plainparquet")
    lineitem.limit(500).write.partitionBy("l_returnflag").parquet(raw)
    convert_to_deltalake(raw, spark=spark)
    t = DeltaTable(raw)
    assert t.count() == 500
    assert t.partition_columns() == ["l_returnflag"]
    # partition col values come from dir names
    flags = {r[0] for r in t.to_df().select("l_returnflag").distinct().collect()}
    assert flags <= {"A", "N", "R"}


def test_generate_manifest(spark, tmp_table, lineitem):
    write_deltalake(tmp_table, lineitem.limit(100), partition_by=["l_returnflag"])
    from delta_rs_spark.operators.generate import generate_symlink_manifest

    files = generate_symlink_manifest(tmp_table)
    assert files
    content = open(files[0]).read().strip().splitlines()
    assert all(line.startswith("file://") for line in content)


def test_is_deltatable(tmp_table, spark, sample_df):
    assert not DeltaTable.is_deltatable(tmp_table)
    write_deltalake(tmp_table, sample_df)
    assert DeltaTable.is_deltatable(tmp_table)


def test_restore_protocol_no_downgrade_by_default(spark, tmp_table, sample_df):
    """Reference restore.rs:268-295: restoring past a feature upgrade
    keeps the upgraded protocol unless protocol_downgrade_allowed."""
    from delta_rs_spark import TableFeatures

    write_deltalake(tmp_table, sample_df)
    t = DeltaTable(tmp_table)
    t.alter.add_feature([TableFeatures.DomainMetadata])
    write_deltalake(tmp_table, sample_df, mode="append")
    t.refresh()
    t.restore(0)
    t.refresh()
    p = t.protocol()
    assert "domainMetadata" in (p.writer_features or [])  # no silent downgrade
    assert t.count() == 5
    # explicit downgrade restores the old protocol
    t2 = DeltaTable(tmp_table)
    t2.restore(0, protocol_downgrade_allowed=True)
    t2.refresh()
    p2 = t2.protocol()
    assert not p2.writer_features or "domainMetadata" not in p2.writer_features


def test_optimize_min_commit_interval_incremental(spark, tmp_table):
    """min_commit_interval=0 commits per partition bin (reference
    optimize.rs incremental commits): two compactable partitions produce
    two OPTIMIZE commits, and the data survives intact."""
    both = spark.createDataFrame(
        [(i, "a") for i in range(4)] + [(i, "b") for i in range(4)],
        "id long, p string",
    )
    for _ in range(2):  # 2 appends x 2 partitions = 4 small files
        write_deltalake(tmp_table, both, mode="append", partition_by=["p"])
    t = DeltaTable(tmp_table)
    assert len(t.files()) >= 4
    m = t.optimize.compact(min_commit_interval=0)
    t.refresh()
    assert m["numFilesRemoved"] >= 4
    ops = [h["operation"] for h in t.history()]
    assert ops.count("OPTIMIZE") == 2  # one commit per partition bin
    assert t.count() == 16  # 2 appends x 8 rows
    assert len(t.files()) == 2


def test_auto_compact_post_commit(spark, tmp_path):
    """delta.autoOptimize.autoCompact: once small files accumulate past
    minNumFiles, the write that crosses the threshold triggers a
    compaction commit automatically."""
    from pyspark.sql import functions as F

    from delta_rs_spark import DeltaTable, write_deltalake

    table = str(tmp_path / "autocompact")
    df = spark.range(10).select(F.col("id"))
    write_deltalake(
        table,
        df.coalesce(1),
        configuration={
            "delta.autoOptimize.autoCompact": "true",
            "delta.autoOptimize.minNumFiles": "6",
        },
    )
    for i in range(1, 7):
        write_deltalake(
            table,
            spark.range(10 * i, 10 * i + 10).select(F.col("id")).coalesce(1),
            mode="append",
        )
    t = DeltaTable(table)
    # the threshold-crossing append auto-compacted: far fewer live files
    # than the 7 written, history shows an OPTIMIZE commit, data intact
    assert len(t.files()) < 6
    ops = [h["operation"] for h in t.history()]
    assert "OPTIMIZE" in ops
    assert sorted(r.id for r in t.to_df().collect()) == list(range(70))


def test_zorder_on_partitioned_table_preserves_clustering(spark, tmp_path):
    """Z-order on a PARTITIONED table must keep its clustering through
    the write: per output file, the z-ordered column's min/max ranges
    should be narrow (write_files' hash repartition used to shuffle the
    carefully range-partitioned rows back together)."""
    import json as _json

    from pyspark.sql import functions as F

    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.log import snapshot as snap_mod

    table = str(tmp_path / "zpart")
    df = spark.range(20_000).select(
        F.col("id"),
        (F.col("id") % 2).alias("part"),
        (F.col("id") * 37 % 10_000).alias("v"),
    )
    write_deltalake(table, df.repartition(8), partition_by=["part"])
    t = DeltaTable(table)
    t.optimize.z_order(["v"], target_size=64 * 1024)
    t.refresh()
    snap = snap_mod.load_snapshot(table)
    files = [a for a in snap.files.values()]
    assert len(files) >= 4
    # clustering quality: average per-file v-range must be far below the
    # global range (a hash-shuffled write gives every file ~full range)
    spans = []
    for a in files:
        st = a.stats_dict()
        lo, hi = st["minValues"].get("v"), st["maxValues"].get("v")
        if lo is not None and hi is not None:
            spans.append(int(hi) - int(lo))
    assert spans and sum(spans) / len(spans) < 10_000 * 0.6, spans
    assert t.count() == 20_000


def test_hilbert_index_is_a_true_hilbert_curve():
    """hilbert_index (r08): bijective over the full grid and every
    consecutive curve step moves exactly 1 in exactly one dimension —
    the locality property Morton interleave does NOT have (Morton takes
    long diagonal jumps at bit boundaries)."""
    import numpy as np

    from delta_rs_spark.operators.optimize import hilbert_index

    for n, bits in ((2, 4), (3, 3)):
        side = 1 << bits
        grids = np.meshgrid(*[np.arange(side)] * n, indexing="ij")
        arrs = [g.ravel().astype(np.int64) for g in grids]
        idx = hilbert_index(arrs, bits)
        assert sorted(idx.tolist()) == list(range(side**n))
        order = np.argsort(idx)
        coords = np.stack(arrs, axis=1)[order]
        steps = np.abs(np.diff(coords, axis=0)).sum(axis=1)
        assert (steps == 1).all()
    # 1-D degenerates to identity; overflow guarded
    assert hilbert_index([np.arange(8, dtype=np.int64)], 3).tolist() == list(range(8))
    with pytest.raises(DeltaError, match="overflow"):
        hilbert_index([np.zeros(1, dtype=np.int64)] * 8, 8)


def test_optimize_zorder_hilbert(spark, tmp_table, lineitem):
    write_deltalake(tmp_table, lineitem.repartition(4))
    t = DeltaTable(tmp_table)
    n = t.count()
    m = t.optimize.z_order(["l_orderkey", "l_partkey"], curve="hilbert")
    assert m["numFilesAdded"] >= 1
    assert t.count() == n  # clustering never changes data
    assert t.history(1)[0]["operationParameters"]["curve"] == "hilbert"
    from delta_rs_spark.plans.skipping import prune_files

    adds = list(t._snapshot.files.values())
    if len(adds) > 1:
        kept = prune_files(adds, "l_orderkey < 100", [])
        assert len(kept) < len(adds)
    with pytest.raises(DeltaError, match="curve"):
        t.optimize.z_order(["l_orderkey"], curve="peano")
    # >7 dims would spill interleaved bits into the int64 sign bit
    # (silent sort inversion on morton, executor-side crash on hilbert)
    # — rejected eagerly, before any job launches, for both curves
    with pytest.raises(DeltaError, match="at most 7"):
        t.optimize.z_order([f"c{i}" for i in range(8)])


def test_optimize_zorder_incremental(spark, tmp_table, lineitem):
    """r09: incremental clustering — the 100 TB maintenance shape. A
    full run tags its outputs with the (curve, columns) spec; a later
    incremental run rewrites ONLY untagged arrivals, leaving the stable
    cube's files physically untouched; a no-new-data increment is a
    metadata no-op; and a spec change (different columns) invalidates
    the tags so everything reclusters."""
    base = lineitem.filter("l_orderkey < 1000")
    tail = lineitem.filter("l_orderkey >= 1000")
    write_deltalake(tmp_table, base.repartition(3))
    t = DeltaTable(tmp_table)
    n_base = t.count()
    m1 = t.optimize.z_order(["l_orderkey", "l_partkey"])
    assert m1["numFilesSkippedAlreadyClustered"] == 0
    cube1 = set(t.files())
    for a in t._snapshot.files.values():
        assert a.tags["optimizeSpec"] == "morton:l_orderkey,l_partkey"
        assert int(a.tags["zcubeBytes"]) > 0

    # new arrivals -> only they recluster; cube-1 files stay on disk
    write_deltalake(tmp_table, tail.repartition(2), mode="append")
    t.refresh()
    n_all = t.count()
    m2 = t.optimize.z_order(["l_orderkey", "l_partkey"], incremental=True)
    assert m2["numFilesSkippedAlreadyClustered"] == len(cube1)
    assert m2["numFilesRemoved"] == 2 and m2["numFilesAdded"] >= 1
    t.refresh()
    assert cube1 <= set(t.files())  # stable cube physically untouched
    assert t.count() == n_all

    # nothing new -> no rewrite at all
    m3 = t.optimize.z_order(["l_orderkey", "l_partkey"], incremental=True)
    assert m3 == {
        "numFilesAdded": 0,
        "numFilesRemoved": 0,
        "numFilesSkippedAlreadyClustered": len(t.files()),
    }

    # a small second cube re-merges once min_cube_size exceeds it
    m4 = t.optimize.z_order(
        ["l_orderkey", "l_partkey"], incremental=True,
        min_cube_size=10 ** 12,
    )
    assert m4["numFilesSkippedAlreadyClustered"] == 0
    assert m4["numFilesRemoved"] == len(cube1) + (m2["numFilesAdded"])

    # different spec -> tags don't match -> full recluster
    m5 = t.optimize.z_order(["l_quantity"], incremental=True)
    assert m5["numFilesSkippedAlreadyClustered"] == 0
    assert m5["numFilesRemoved"] >= 1
    t.refresh()
    assert t.count() == n_all
    assert n_all > n_base  # the append really added rows
    # history records the incremental flag
    ops = [h["operationParameters"] for h in t.history(4)]
    assert any(p.get("incremental") for p in ops)


def test_vacuum_lite_log_driven(spark, tmp_path):
    """VACUUM LITE (delta-spark 3.3 semantics): candidates come from the
    log's tombstones — identical result to the listing vacuum for
    tombstoned files, but orphans only FULL can see stay invisible."""
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.log.commit import DeltaError

    path = str(tmp_path / "vl")
    df = spark.range(20).selectExpr("id", "id * 2 AS v")
    write_deltalake(path, df, max_records_per_file=5)
    dt = DeltaTable(path, spark=spark)
    dt.delete("id < 10")  # rewrites 2 files -> tombstones
    dt = DeltaTable(path, spark=spark)

    classic = dt.vacuum(retention_hours=0, enforce_retention_duration=False)
    lite = dt.vacuum(retention_hours=0, enforce_retention_duration=False, lite=True)
    assert lite == classic and lite  # same candidate set, log-only

    # an orphan (no log entry): classic/FULL sees it, LITE cannot
    orphan = os.path.join(path, "orphan-123.parquet")
    with open(orphan, "wb") as f:
        f.write(b"x")
    os.utime(orphan, (1, 1))
    assert "orphan-123.parquet" not in dt.vacuum(
        retention_hours=0, enforce_retention_duration=False, lite=True
    )
    assert "orphan-123.parquet" in dt.vacuum(
        retention_hours=0, enforce_retention_duration=False, full=True
    )
    os.unlink(orphan)

    with pytest.raises(DeltaError, match="contradictory"):
        dt.vacuum(retention_hours=0, enforce_retention_duration=False,
                  lite=True, full=True)

    # retention still respected on the lite path
    assert dt.vacuum(retention_hours=9999, lite=True) == []

    # real deletion through the lite path; table intact afterwards
    gone = dt.vacuum(
        retention_hours=0, enforce_retention_duration=False,
        dry_run=False, lite=True,
    )
    assert gone == lite
    for rel in gone:
        assert not os.path.exists(os.path.join(path, rel))
    assert DeltaTable(path, spark=spark).to_df().count() == 10


def test_cleanup_keeps_loaded_version_reachable(spark, tmp_path, sample_df):
    """cleanup_metadata on a table OPENED AT AN OLD VERSION must not
    clean that version out from under itself: the keep floor is the
    loaded snapshot's version, and without a checkpoint at-or-below it
    the call deletes NOTHING (reference test_cleanup.py
    test_failed_cleanup + protocol/checkpoints.rs safe-checkpoint rule,
    issue #3692)."""
    path = str(tmp_path / "t")
    cfg = {"delta.logRetentionDuration": "interval 0 day"}
    for i in range(10):
        df = spark.createDataFrame(
            [(str(i), i, i, False)], "id string, price long, sold int, deleted boolean"
        )
        write_deltalake(path, df, mode="overwrite", configuration=cfg)
    # checkpoint ONLY the final version
    DeltaTable(path).create_checkpoint()

    t5 = DeltaTable(path)
    t5.load_as_version(5)
    assert t5.cleanup_metadata() == 0  # no checkpoint <= 5: total no-op
    t5b = DeltaTable(path)
    t5b.load_as_version(5)
    assert [r.price for r in t5b.to_df().collect()] == [5]

    # loaded at latest, the same call cleans below the checkpoint
    n = DeltaTable(path).cleanup_metadata()
    assert n > 0
    assert DeltaTable(path).to_df().count() == 1


def test_restore_commit_and_posthook_properties(spark, tmp_table, sample_df):
    """restore() forwards CommitProperties (custom userName in the
    RESTORE commit) and PostCommitHookProperties (checkpoint hook off)
    — reference test_restore.py test_restore_with_version /
    test_restore_with_post_commithook_properties; a timestamp earlier
    than every commit clamps to the earliest version."""
    import glob

    from delta_rs_spark import CommitProperties, PostCommitHookProperties

    for _ in range(3):
        write_deltalake(tmp_table, sample_df, mode="append")
    t = DeltaTable(tmp_table)
    old_version = t.version()
    t.restore(
        1,
        commit_properties=CommitProperties(custom_metadata={"userName": "John Doe"}),
        post_commithook_properties=PostCommitHookProperties(
            create_checkpoint=False, cleanup_expired_logs=False
        ),
    )
    last = t.history(1)[0]
    assert last["operation"] == "RESTORE"
    assert last["userName"] == "John Doe"
    assert t.version() == old_version + 1
    assert glob.glob(os.path.join(tmp_table, "_delta_log", "*.checkpoint.parquet")) == []
    # a pre-history timestamp restores to the EARLIEST version
    t.restore("2020-05-01T00:47:31-07:00")
    assert t.history(1)[0]["operation"] == "RESTORE"
    assert t.count() == 5
