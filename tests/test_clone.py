"""SHALLOW CLONE (operators/clone.py): zero-copy fork semantics.

The reference has no clone operation; this is the delta-spark-parity
superset surface. What must hold: the clone is O(metadata) (no data
files copied), reads identically to the source version it was taken
at, diverges independently under mutation in BOTH directions, vacuums
without touching source files, inherits DV state through absolute 'p'
descriptors, and supports time-travel clones.
"""

import os

import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, clone_table, write_deltalake
from delta_rs_spark.log.commit import DeltaError


def _parquet_under(root: str) -> list[str]:
    out = []
    for r, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        out += [os.path.join(r, f) for f in files if f.endswith(".parquet")]
    return out


def _df20(spark):
    return spark.range(20).withColumn("value", F.col("id").cast("double"))


def test_shallow_clone_zero_copy_and_divergence(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(src, _df20(spark))
    clone_table(src, dst)

    # zero-copy: the clone directory holds a log and NO data files
    assert _parquet_under(dst) == []
    s, c = DeltaTable(src, spark=spark), DeltaTable(dst, spark=spark)
    assert sorted(map(tuple, c.to_df().collect())) == sorted(
        map(tuple, s.to_df().collect())
    )
    assert c.version() == 0
    h = c.history(1)[0]
    assert h["operation"] == "CLONE"
    # operationParameters stringify per the log convention
    assert str(h["operationParameters"]["sourceVersion"]) == str(s.version())
    # fresh identity, inherited schema
    assert c.metadata().id != s.metadata().id
    assert c.schema().json() == s.schema().json()

    # clone mutations never touch the source...
    n_src = s.count()
    c.delete("id % 2 = 0")
    c.update({"value": "value + 100"}, predicate="id = 1")
    s.refresh()
    assert s.count() == n_src
    assert sorted(r.id for r in c.to_df().collect()) == [
        r for r in range(20) if r % 2
    ]
    # ...and source mutations never touch the clone
    s.delete("id >= 0")
    c.refresh()
    assert c.count() == 10


def test_clone_vacuum_never_deletes_source_files(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(src, _df20(spark))
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    # rewrite everything on the clone so the absolute source refs become
    # tombstones, then vacuum with no retention
    c.delete("id < 100")
    removed = c.vacuum(
        retention_hours=0, dry_run=False, enforce_retention_duration=False
    )
    src_files = _parquet_under(src)
    assert src_files, "source must keep its data files"
    assert all(os.path.exists(p) for p in src_files)
    assert all(not r.startswith(src) for r in removed)
    # the source still reads after the clone's vacuum
    assert DeltaTable(src, spark=spark).count() == 20


def test_clone_inherits_deletion_vectors(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(
        src,
        _df20(spark).coalesce(1),  # one file -> the delete is partial -> DV tier
        configuration={"delta.enableDeletionVectors": "true"},
    )
    s = DeltaTable(src, spark=spark)
    s.delete("id < 5")  # DV soft delete: files keep dead rows
    s.refresh()
    assert any(a.deletion_vector for a in s._snapshot.files.values())
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    dvs = [a.deletion_vector for a in c._snapshot.files.values() if a.deletion_vector]
    assert dvs and all(d["storageType"] in ("p", "i") for d in dvs)
    assert sorted(r.id for r in c.to_df().collect()) == list(range(5, 20))
    # DV mutations on the clone write the clone's own sidecars
    c.delete("id < 8")
    assert sorted(r.id for r in c.to_df().collect()) == list(range(8, 20))
    s.refresh()
    assert sorted(r.id for r in s.to_df().collect()) == list(range(5, 20))


def test_clone_time_travel_and_config_override(spark, tmp_path):
    src = str(tmp_path / "src")
    write_deltalake(src, _df20(spark))
    s = DeltaTable(src, spark=spark)
    s.delete("id >= 10")
    dst0 = str(tmp_path / "at_v0")
    clone_table(src, dst0, version=0, configuration={"delta.appendOnly": "false"})
    c0 = DeltaTable(dst0, spark=spark)
    assert c0.count() == 20  # the pre-delete state
    assert c0.metadata().configuration["delta.appendOnly"] == "false"

    # clone of a clone stays one-hop absolute (no chain through dst0)
    dst1 = str(tmp_path / "of_clone")
    clone_table(dst0, dst1)
    c1 = DeltaTable(dst1, spark=spark)
    assert c1.count() == 20
    assert _parquet_under(dst1) == []
    from delta_rs_spark.operators.util import resolve_add_path

    for a in c1._snapshot.files.values():
        # r10: absolute references are percent-encoded file: URIs per
        # PROTOCOL.md, and a clone of a clone resolves to the ORIGINAL
        # source's files (one hop, no chain through dst0)
        assert a.path.startswith("file://")
        assert resolve_add_path(dst1, a.path).startswith(
            str(tmp_path / "src")
        )

    with pytest.raises(DeltaError, match="already exists"):
        clone_table(src, dst0)
    with pytest.raises(DeltaError, match="not a Delta table"):
        clone_table(str(tmp_path / "nope"), str(tmp_path / "d2"))


def test_clone_partitioned_source(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(
        src, _df20(spark).withColumn("p", F.col("id") % 3), partition_by=["p"]
    )
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    assert c.metadata().partition_columns == ["p"]
    # partition pruning works through absolute refs
    assert c.to_df(predicate="p = 1").count() == 7
    c.delete("p = 1")
    assert c.count() == 13
    assert DeltaTable(src, spark=spark).count() == 20


def test_source_vacuum_breaks_shallow_but_not_deep_clone(spark, tmp_path):
    """The documented caveat (clone.py docstring, same as delta-spark's):
    a shallow clone's files belong to the source — once the source
    tombstones and VACUUMs them, the shallow clone breaks. A deep clone
    copied its files and is immune."""
    src = str(tmp_path / "src")
    sh = str(tmp_path / "shallow")
    dp = str(tmp_path / "deep")
    write_deltalake(src, _df20(spark))
    clone_table(src, sh)
    clone_table(src, dp, shallow=False)

    d = DeltaTable(dp, spark=spark)
    assert _parquet_under(dp), "deep clone must copy data files"
    h = d.history(1)[0]
    assert str(h["operationParameters"]["isShallow"]) in ("False", "false")

    s = DeltaTable(src, spark=spark)
    s.delete("id >= 0")  # tombstone everything on the source...
    s.vacuum(retention_hours=0, dry_run=False, enforce_retention_duration=False)
    assert _parquet_under(src) == []

    assert d.count() == 20  # deep clone unaffected
    with pytest.raises(Exception):
        # shallow clone now references deleted files — the documented
        # failure mode, surfacing as a read error, not silent data loss
        DeltaTable(sh, spark=spark).to_df().collect()


def test_deep_clone_partitioned_and_of_shallow(spark, tmp_path):
    src = str(tmp_path / "src")
    sh = str(tmp_path / "sh")
    dp = str(tmp_path / "dp")
    write_deltalake(
        src, _df20(spark).withColumn("p", F.col("id") % 3), partition_by=["p"]
    )
    clone_table(src, sh)          # shallow (absolute refs, k=v under src)
    clone_table(sh, dp, shallow=False)  # deep OF the shallow clone
    d = DeltaTable(dp, spark=spark)
    assert d.count() == 20
    # partition dirs were reconstructed under the deep clone's own root
    assert all(p.startswith(dp) for p in _parquet_under(dp))
    assert d.to_df(predicate="p = 1").count() == 7
    # fully self-contained: nuking src and sh leaves it readable
    import shutil

    shutil.rmtree(src)
    shutil.rmtree(sh)
    d.refresh()
    assert d.count() == 20


def test_clone_of_column_mapped_table(spark, tmp_path):
    """Column-mapping metadata (field ids + physical names) lives in the
    schema string the clone inherits verbatim, so a clone of a mapped
    table must read logically identical data through the source's
    physical files — and mapped mutations on the clone must stay
    isolated."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(
        src,
        _df20(spark),
        configuration={"delta.columnMapping.mode": "name"},
    )
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    assert c.metadata().configuration["delta.columnMapping.mode"] == "name"
    assert sorted(r.id for r in c.to_df().collect()) == list(range(20))
    c.delete("id < 10")
    assert sorted(r.id for r in c.to_df().collect()) == list(range(10, 20))
    assert DeltaTable(src, spark=spark).count() == 20


def test_clone_optimize_localizes_files(spark, tmp_path):
    """OPTIMIZE on a shallow clone reads through the absolute source
    refs and writes clone-LOCAL files — after a full rewrite the clone
    no longer depends on the source at all (compaction as a lazy
    deep-clone migration path)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(src, _df20(spark).repartition(4))
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    m = c.optimize.compact(target_size=10**9)
    assert m["numFilesRemoved"] == 4 and m["numFilesAdded"] >= 1
    c.refresh()
    assert all(not os.path.isabs(a.path) for a in c._snapshot.files.values())
    assert c.count() == 20
    # now fully self-contained
    import shutil

    shutil.rmtree(src)
    c.refresh()
    assert c.count() == 20


def test_clone_at_timestamp(spark, tmp_path):
    """Timestamp clones resolve through the same commit-timestamp
    binary search as load_as_version: a timestamp after v0 but before
    the delete clones the 20-row state."""
    import datetime as dt
    import json
    import os as _os

    src = str(tmp_path / "src")
    write_deltalake(src, _df20(spark))
    s = DeltaTable(src, spark=spark)
    # pin commit timestamps so "between v0 and v1" is well-defined
    log = _os.path.join(src, "_delta_log")
    for v, ts in ((0, 1_600_000_000_000),):
        p = _os.path.join(log, f"{v:020d}.json")
        _os.utime(p, (ts / 1000, ts / 1000))
    s.delete("id >= 10")
    mid = dt.datetime.fromtimestamp(1_600_000_500, dt.timezone.utc)
    # v1's commit is 'now' (far later than mid); v0 is pinned earlier
    dstv = str(tmp_path / "at_ts")
    clone_table(src, dstv, version=mid.isoformat())
    assert DeltaTable(dstv, spark=spark).count() == 20


def _external_abs_table(spark, tmp_path, tbl_name="ext"):
    """A spec-legal EXTERNAL table whose log carries percent-encoded
    absolute file: URI adds pointing at two non-Hive directories that
    share a parquet BASENAME (PROTOCOL.md allows absolute references;
    foreign writers and convert-style layouts produce non-uuid names).
    Built through the engine's own commit API."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from delta_rs_spark.log import commit as commit_mod
    from delta_rs_spark.log.actions import Add, CommitInfo, Metadata, Protocol
    from delta_rs_spark.log.commit import TransactionInfo
    from delta_rs_spark.operators.util import encode_abs_add_path

    d1 = tmp_path / "lib one"   # space: encoding must round-trip
    d2 = tmp_path / "lib %41"   # literal %XX: must NOT be mis-decoded
    d1.mkdir()
    d2.mkdir()
    pq.write_table(pa.table({"id": list(range(10))}), str(d1 / "data.parquet"))
    pq.write_table(
        pa.table({"id": list(range(10, 20))}), str(d2 / "data.parquet")
    )
    tbl = str(tmp_path / tbl_name)
    os.makedirs(tbl)
    schema = T.StructType([T.StructField("id", T.LongType(), True)])
    adds = [
        Add(
            path=encode_abs_add_path(str(d / "data.parquet")),
            size=os.path.getsize(str(d / "data.parquet")),
            modification_time=1_600_000_000_000,
            data_change=True,
            partition_values={},
            stats=None,
        )
        for d in (d1, d2)
    ]
    commit_mod.commit(
        tbl,
        [Protocol(), Metadata(schema_string=schema.json()), *adds],
        CommitInfo("WRITE", {}),
        -1,
        TransactionInfo(blind_append=False, read_whole_table=True),
    )
    return tbl


def test_external_absolute_uri_adds_read_and_deep_clone_collision(
    spark, tmp_path
):
    """r10 ADVICE (medium): deep-cloning absolute adds used to flatten
    each file to its basename — two files named data.parquet in
    different non-Hive source dirs mapped to ONE dst path, the second
    copy2 silently overwriting the first (10 rows duplicated, 10
    lost). The flatten must disambiguate. Also pins that percent-
    encoded file: URI adds (the PROTOCOL.md spelling) scan correctly
    through paths carrying spaces and literal %XX."""
    tbl = _external_abs_table(spark, tmp_path)
    t = DeltaTable(tbl, spark=spark)
    assert sorted(r.id for r in t.to_df().collect()) == list(range(20))

    deep = str(tmp_path / "deep")
    clone_table(tbl, deep, shallow=False)
    c = DeltaTable(deep, spark=spark)
    assert sorted(r.id for r in c.to_df().collect()) == list(range(20))
    copied = _parquet_under(deep)
    assert len(copied) == 2, f"basename collision collapsed files: {copied}"
    assert len({os.path.basename(p) for p in copied}) == 2

    # shallow clone of the same table: one-hop URI references, zero copy
    shallow = str(tmp_path / "shallow")
    clone_table(tbl, shallow)
    sc = DeltaTable(shallow, spark=spark)
    assert _parquet_under(shallow) == []
    assert sorted(r.id for r in sc.to_df().collect()) == list(range(20))
    # mutations match the URI-keyed files (planner candidate spellings)
    sc.delete("id < 5")
    assert sorted(r.id for r in sc.to_df().collect()) == list(range(5, 20))
    t.refresh()
    assert t.count() == 20  # source untouched


def test_shallow_clone_source_path_with_special_chars(spark, tmp_path):
    """r10 ADVICE (low): shallow-clone adds are percent-encoded file:
    URIs per PROTOCOL.md. A source living under a path with spaces and
    a literal %XX sequence must round-trip: scan, DV inheritance,
    mutation, and time travel on the clone all resolve the encoded
    references back to the raw filesystem path."""
    src = str(tmp_path / "we ird %41 src")
    write_deltalake(
        src,
        _df20(spark).coalesce(1),
        configuration={"delta.enableDeletionVectors": "true"},
    )
    s = DeltaTable(src, spark=spark)
    s.delete("id >= 15")  # DV tier: descriptor, not rewrite
    s.refresh()
    assert set(s.files()) and s.count() == 15

    dst = str(tmp_path / "clone")
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    for a in c._snapshot.files.values():
        assert a.path.startswith("file://")
        assert " " not in a.path and "%41" not in a.path.replace("%2541", "")
    assert _parquet_under(dst) == []
    assert sorted(r.id for r in c.to_df().collect()) == list(range(15))

    # DV descriptors came through as encoded 'p' URIs and still decode
    dvs = [
        a.deletion_vector
        for a in c._snapshot.files.values()
        if a.deletion_vector
    ]
    assert dvs and all(d["storageType"] in ("p", "i") for d in dvs)

    # clone-side mutation rewrites locally; source untouched
    c.delete("id < 3")
    assert sorted(r.id for r in c.to_df().collect()) == list(range(3, 15))
    s.refresh()
    assert s.count() == 15


def test_shallow_clone_refresh_syncs_with_source(spark, tmp_path):
    """r10 (VERDICT r09 Next #5): re-cloning onto an existing clone with
    replace=True brings it to the source's CURRENT state — delta-spark's
    repeated CREATE OR REPLACE ... CLONE. The refreshed clone must read
    hash-identically to a fresh clone taken now; clone-local mutations
    are replaced (but stay time-travelable); the table keeps its id and
    version history; without replace=True the existing target still
    refuses."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dev_copy")
    write_deltalake(src, _df20(spark))
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    table_id = c.metadata().id
    c.delete("id >= 18")  # clone-local divergence (to be replaced)
    assert c.count() == 18

    # source moves on
    s = DeltaTable(src, spark=spark)
    s.delete("id % 2 = 0")
    s.update({"value": "value + 1000"}, predicate="id = 1")
    write_deltalake(
        src, spark.range(100, 105).withColumn("value", F.lit(0.5)), mode="append"
    )

    with pytest.raises(DeltaError, match="replace=True"):
        clone_table(src, dst)
    clone_table(src, dst, replace=True)
    c.refresh()

    fresh = str(tmp_path / "fresh")
    clone_table(src, fresh)
    want = sorted(map(tuple, DeltaTable(fresh, spark=spark).to_df().collect()))
    assert sorted(map(tuple, c.to_df().collect())) == want
    assert c.metadata().id == table_id  # same table, refreshed
    # still zero-copy: every CURRENT reference is an absolute URI into
    # the source (the pre-refresh local rewrite stays on disk only for
    # time travel, tombstoned and vacuumable)
    assert all(
        a.path.startswith("file://") for a in c._snapshot.files.values()
    )
    h = c.history(1)[0]
    assert h["operation"] == "CLONE"
    assert str(h["operationParameters"]["replace"]) in ("True", "true")

    # pre-refresh states stay reachable (local divergence included)
    pre = DeltaTable(dst, spark=spark, version=1)
    assert pre.count() == 18

    # the refresh is itself a mutation: further source changes + another
    # refresh keep tracking
    s.delete("id = 101")
    clone_table(src, dst, replace=True)
    c.refresh()
    s.refresh()
    assert sorted(map(tuple, c.to_df().collect())) == sorted(
        map(tuple, s.to_df().collect())
    )


def test_clone_refresh_preserves_protocol_and_deep_mode(spark, tmp_path):
    """Refresh never downgrades the target's protocol (a clone that
    gained features keeps them), and a DEEP refresh re-copies into a
    self-contained state that survives source removal."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "deepc")
    write_deltalake(src, _df20(spark))
    clone_table(src, dst, shallow=False)
    c = DeltaTable(dst, spark=spark)
    # raise the clone's protocol via a feature the source lacks
    c.alter.add_feature(["deletionVectors"])
    c.refresh()
    rv = (c.protocol().min_reader_version, c.protocol().min_writer_version)

    write_deltalake(
        src, spark.range(50, 55).withColumn("value", F.lit(1.5)), mode="append"
    )
    clone_table(src, dst, shallow=False, replace=True)
    c.refresh()
    assert c.count() == 25
    p = c.protocol()
    assert (p.min_reader_version, p.min_writer_version) >= rv
    feats = (p.writer_features or []) + (p.reader_features or [])
    assert "deletionVectors" in feats

    import shutil

    shutil.rmtree(src)
    c.refresh()
    assert c.count() == 25  # deep refresh stays self-contained


def test_clone_refresh_racing_mutation_conflicts_cleanly(spark, tmp_path, monkeypatch):
    """r10: a replace-refresh is planned from a snapshot of the target;
    a mutation that commits between that read and the refresh commit
    would leave files the refresh never tombstoned (extra rows — a
    lost-update corruption). The refresh declares read_whole_table, so
    the OCC check must raise ConcurrentAppendError cleanly with the
    target readable and the racing write intact."""
    from delta_rs_spark import DeltaTable, clone_table, write_deltalake
    from delta_rs_spark.log import commit as commit_mod
    from delta_rs_spark.log.commit import ConcurrentAppendError
    from delta_rs_spark.operators import clone as clone_mod

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(src, _df20(spark))
    clone_table(src, dst)
    write_deltalake(
        src, spark.range(50, 55).withColumn("value", F.lit(0.5)), mode="append"
    )

    real_commit = commit_mod.commit
    fired = {"n": 0}

    def racing_commit(path, actions, op, read_version, *a, **kw):
        # the interleaved writer lands AFTER the refresh read its
        # snapshot and BEFORE its commit — classic OCC race
        if fired["n"] == 0 and path == dst:
            fired["n"] = 1
            write_deltalake(
                dst,
                spark.range(900, 905).withColumn("value", F.lit(9.0)),
                mode="append",
            )
        return real_commit(path, actions, op, read_version, *a, **kw)

    monkeypatch.setattr(clone_mod.commit_mod, "commit", racing_commit)
    with pytest.raises(ConcurrentAppendError):
        clone_table(src, dst, replace=True)

    # target readable; the racing append survived; no half-refresh
    c = DeltaTable(dst, spark=spark)
    assert c.count() == 25  # 20 cloned + 5 raced
    assert sorted(r.id for r in c.to_df().filter("id >= 900").collect()) == [
        900, 901, 902, 903, 904,
    ]

    # a clean retry (no race) then succeeds and lands on the source
    monkeypatch.setattr(clone_mod.commit_mod, "commit", real_commit)
    clone_table(src, dst, replace=True)
    c.refresh()
    s = DeltaTable(src, spark=spark)
    assert sorted(map(tuple, c.to_df().collect())) == sorted(
        map(tuple, s.to_df().collect())
    )


def test_vacuum_after_refresh_reclaims_local_files_only(spark, tmp_path):
    """r10: a refresh tombstones the clone's pre-refresh state. VACUUM
    must then reclaim the clone-LOCAL rewrite files (they are under the
    clone root and no longer referenced) while the absolute source
    references — tombstoned or live — remain structurally unreachable
    from the delete set. After vacuum, time travel to pre-refresh
    versions is gone (files reclaimed) but the refreshed state reads."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(src, _df20(spark))
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    c.delete("id % 2 = 0")  # local rewrite -> clone-local parquet
    local_before = set(_parquet_under(dst))
    assert local_before, "the local delete must have written files"

    clone_table(src, dst, replace=True)
    c.refresh()
    removed = c.vacuum(
        retention_hours=0, dry_run=False, enforce_retention_duration=False
    )
    # the local rewrites are gone, the source is untouched
    assert set(_parquet_under(dst)) == set()
    assert all(not r.startswith(src) for r in removed)
    assert DeltaTable(src, spark=spark).count() == 20
    assert c.count() == 20  # refreshed state reads through source refs


def test_deep_refresh_never_overwrites_prior_generation_files(
    spark, tmp_path
):
    """r11 ADVICE: on a deep replace-refresh, _salted's collision set
    only tracked the CURRENT invocation. If the source dropped the
    absolute-add file that previously claimed the unsalted basename
    (A/data.parquet) and a different foreign file (B/data.parquet)
    flattens to the same name, the copy silently overwrote the old
    bytes — still referenced by the target's tombstoned pre-refresh
    versions, so time travel read B's rows under A's add entry. The
    refresh must salt against everything already on disk."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from delta_rs_spark.log import commit as commit_mod
    from delta_rs_spark.log.actions import (
        Add,
        CommitInfo,
        Metadata,
        Protocol,
        Remove,
    )
    from delta_rs_spark.log.commit import TransactionInfo
    from delta_rs_spark.operators.util import encode_abs_add_path

    d1 = tmp_path / "genA"
    d2 = tmp_path / "genB"
    d1.mkdir()
    d2.mkdir()
    pq.write_table(pa.table({"id": list(range(10))}), str(d1 / "data.parquet"))
    pq.write_table(
        pa.table({"id": list(range(10, 20))}), str(d2 / "data.parquet")
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = T.StructType([T.StructField("id", T.LongType(), True)])

    def _add(d):
        return Add(
            path=encode_abs_add_path(str(d / "data.parquet")),
            size=os.path.getsize(str(d / "data.parquet")),
            modification_time=1_600_000_000_000,
            data_change=True,
            partition_values={},
            stats=None,
        )

    commit_mod.commit(
        src,
        [Protocol(), Metadata(schema_string=schema.json()), _add(d1)],
        CommitInfo("WRITE", {}),
        -1,
        TransactionInfo(blind_append=False, read_whole_table=True),
    )
    dst = str(tmp_path / "dst")
    clone_table(src, dst, shallow=False)
    c = DeltaTable(dst, spark=spark)
    assert sorted(r.id for r in c.to_df().collect()) == list(range(10))
    gen1 = _parquet_under(dst)
    assert len(gen1) == 1

    # source swaps A's file for B's — same flattened basename
    commit_mod.commit(
        src,
        [Remove(path=_add(d1).path, data_change=True), _add(d2)],
        CommitInfo("WRITE", {}),
        0,
        TransactionInfo(blind_append=False, read_whole_table=True),
    )
    clone_table(src, dst, shallow=False, replace=True)
    c.refresh()
    assert sorted(r.id for r in c.to_df().collect()) == list(range(10, 20))
    # generation-1 bytes are intact: pre-refresh time travel still
    # reads A's rows, and the new copy landed on a salted name
    old = DeltaTable(dst, spark=spark, version=0)
    assert sorted(r.id for r in old.to_df().collect()) == list(range(10))
    assert len(_parquet_under(dst)) == 2


def test_vacuum_lite_never_reaches_clone_source(spark, tmp_path, monkeypatch):
    """r12 ADVICE (high): LITE vacuum builds candidates from tombstone
    keys without a listing, so a tombstoned 'p' DV descriptor on a
    shallow clone resolves to the SOURCE table ('../src/…'). The lite
    branch must reject any candidate whose realpath escapes the clone
    root — otherwise a dry_run lists, and a real run unlinks, the
    source's still-live DV sidecar."""
    from delta_rs_spark.operators import delete as delete_mod

    # force the sidecar ('u'/'p') DV tier even for tiny bitmaps so the
    # clone's tombstone carries a file-backed descriptor
    monkeypatch.setattr(delete_mod, "_DV_INLINE_MAX_BYTES", 0)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_deltalake(
        src,
        _df20(spark).coalesce(1),
        configuration={"delta.enableDeletionVectors": "true"},
    )
    s = DeltaTable(src, spark=spark)
    s.delete("id < 5")  # source gets a DV sidecar it still references
    clone_table(src, dst)
    c = DeltaTable(dst, spark=spark)
    # merging the inherited 'p' DV tombstones the old (path, DV) pair —
    # whose DV sidecar lives under the SOURCE root
    c.delete("id < 8")
    c.refresh()
    src_dvs = [
        f for f in os.listdir(src) if f.startswith("deletion_vector")
    ]
    assert src_dvs, "source must hold the live DV sidecar"

    lite = c.vacuum(retention_hours=0, enforce_retention_duration=False,
                    lite=True)
    assert all(not r.startswith("..") and not os.path.isabs(r) for r in lite)

    c.vacuum(retention_hours=0, enforce_retention_duration=False,
             dry_run=False, lite=True)
    # the source's DV sidecar survived; both tables still read correctly
    for f in src_dvs:
        assert os.path.exists(os.path.join(src, f))
    s.refresh()
    assert sorted(r.id for r in s.to_df().collect()) == list(range(5, 20))
    assert sorted(r.id for r in c.to_df().collect()) == list(range(8, 20))
