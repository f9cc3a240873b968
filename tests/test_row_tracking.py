"""Row tracking (PROTOCOL.md "Row Tracking"): baseRowId allocation +
high-watermark domain, stable ids through every rewrite path
(DELETE/UPDATE/MERGE/OPTIMIZE, classic and DV tiers), checkpoint
round-trips, OCC allocation races, CDF hygiene."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.plans import row_tracking as rt

CFG = {"delta.enableRowTracking": "true"}


def _ids(dt):
    return {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in dt.to_df_with_row_ids().collect()
    }


def _table(spark, path, n=12, files=4, extra_cfg=None):
    df = spark.range(n).selectExpr("id", "id * 2 AS v")
    write_deltalake(
        str(path),
        df,
        configuration={**CFG, **(extra_cfg or {})},
        max_records_per_file=max(1, n // files),
    )
    return DeltaTable(str(path), spark=spark)


def test_allocation_watermark_and_protocol(spark, tmp_path):
    dt = _table(spark, tmp_path / "t", n=10, files=3)
    proto = dt._snapshot.protocol
    assert "rowTracking" in proto.writer_features
    assert "domainMetadata" in proto.writer_features
    assert "rowTracking" not in (proto.reader_features or [])  # writer-only
    cfg = dt._snapshot.configuration
    assert cfg[rt.MAT_ID_KEY].startswith("_row-id-col-")
    bases = sorted(
        (a.base_row_id, a.num_records()) for a in dt._snapshot.files.values()
    )
    # contiguous non-overlapping ranges from 0
    nxt = 0
    for b, n in bases:
        assert b == nxt
        nxt += n
    dm = dt._snapshot.domain_metadata[rt.DOMAIN]
    assert json.loads(dm.configuration)["rowIdHighWaterMark"] == 9
    ids = _ids(dt)
    assert sorted(x[0] for x in ids.values()) == list(range(10))
    assert {x[1] for x in ids.values()} == {0}

    # append advances past the watermark
    write_deltalake(
        str(tmp_path / "t"),
        spark.range(5).selectExpr("id + 100 AS id", "id AS v"),
        mode="append",
    )
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    ids = _ids(dt)
    assert len({x[0] for x in ids.values()}) == 15
    assert max(x[0] for x in ids.values()) == 14
    assert ids[100][1] == 1


def test_ids_stable_through_delete_update_merge_optimize(spark, tmp_path):
    dt = _table(spark, tmp_path / "t", n=12, files=3)
    v0 = _ids(dt)
    dt.delete("id % 4 = 1")
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    v1 = _ids(dt)
    assert v1 == {k: v for k, v in v0.items() if k % 4 != 1}

    dt.update({"v": "v + 1000"}, predicate="id % 3 = 0")
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    uv = dt.version()
    v2 = _ids(dt)
    for k, (rid, rv) in v2.items():
        assert rid == v1[k][0]
        assert rv == (uv if k % 3 == 0 else v1[k][1])

    src = spark.range(8).selectExpr("id * 2 AS id", "id AS v")
    dt.merge(src, "target.id = source.id").when_matched_update_all(
    ).when_not_matched_insert_all().execute()
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    mv = dt.version()
    v3 = _ids(dt)
    assert len({x[0] for x in v3.values()}) == len(v3)  # globally unique
    for k, (rid, rv) in v3.items():
        if k in v2:
            assert rid == v2[k][0]  # matched rows keep their id
            if k % 2 == 0 and k <= 14:
                assert rv == mv
        else:
            assert rv == mv  # fresh inserts stamped with the merge commit
            assert rid > max(x[0] for x in v2.values()) or rid not in {
                x[0] for x in v2.values()
            }

    dt.optimize.compact()
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    assert _ids(dt) == v3  # pure rearrangement changes nothing

    dt.optimize.z_order(["v"])
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    assert _ids(dt) == v3


def test_dv_tier_preserves_ids(spark, tmp_path):
    dt = _table(
        spark, tmp_path / "t", n=12, files=3,
        extra_cfg={"delta.enableDeletionVectors": "true"},
    )
    v0 = _ids(dt)
    dt.delete("id IN (2, 5)")  # DV soft delete: files untouched
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    v1 = _ids(dt)
    assert v1 == {k: v for k, v in v0.items() if k not in (2, 5)}

    dt.update({"v": "v + 7"}, predicate="id IN (3, 6)")  # DV update tier
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    uv = dt.version()
    v2 = _ids(dt)
    for k, (rid, rv) in v2.items():
        assert rid == v1[k][0]
        assert rv == (uv if k in (3, 6) else v1[k][1])

    # REORG PURGE materializes DVs; ids and versions must both survive
    dt.optimize.reorg_purge()
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    assert _ids(dt) == v2


def test_checkpoints_carry_row_tracking(spark, tmp_path):
    dt = _table(spark, tmp_path / "t", n=8, files=2)
    dt.delete("id = 3")
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    expect = _ids(dt)
    dt.create_checkpoint()
    dt.cleanup_metadata(retention_hours=0)
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    assert _ids(dt) == expect  # classic checkpoint round-trip

    dt.alter.add_feature(["v2Checkpoint"])
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    dt.create_checkpoint(v2=True, sidecar_target_actions=1)
    log = os.path.join(str(tmp_path / "t"), "_delta_log")
    for f in list(os.listdir(log)):
        if snap_mod._COMMIT_RE.match(f):
            os.unlink(os.path.join(log, f))
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    assert _ids(dt) == expect  # V2 sidecar round-trip, zero commits left


def test_concurrent_appends_allocate_disjoint_ranges(spark, tmp_path):
    """Two racing appends: OCC retry must re-allocate the loser's ids
    above the winner's watermark — no overlap, watermark = total - 1."""
    path = str(tmp_path / "race")
    _table(spark, path, n=4, files=1)
    barrier = threading.Barrier(2)
    errs = []

    def appender(tag):
        try:
            df = spark.range(6).selectExpr(f"id + {tag * 1000} AS id", "id AS v")
            barrier.wait()
            write_deltalake(path, df, mode="append")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=appender, args=(i + 1,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    dt = DeltaTable(path, spark=spark)
    ids = [x[0] for x in _ids(dt).values()]
    assert len(set(ids)) == 16
    wm = json.loads(dt._snapshot.domain_metadata[rt.DOMAIN].configuration)[
        "rowIdHighWaterMark"
    ]
    assert wm == max(ids) == 15


def test_cdf_and_stats_stay_clean(spark, tmp_path):
    """The hidden materialized columns never leak into CDF rows or
    data-skipping stats."""
    dt = _table(
        spark, tmp_path / "t", n=8, files=2,
        extra_cfg={"delta.enableChangeDataFeed": "true"},
    )
    dt.delete("id = 1")
    dt.update({"v": "v + 1"}, predicate="id = 2")
    dt = DeltaTable(str(tmp_path / "t"), spark=spark)
    cdf = dt.load_cdf(starting_version=1)
    assert not [c for c in cdf.columns if c.startswith("_row-")]
    assert cdf.count() >= 3  # delete + update pre/post
    for a in dt._snapshot.files.values():
        st = a.stats_dict() or {}
        for sect in ("minValues", "maxValues", "nullCount"):
            assert not [k for k in st.get(sect, {}) if k.startswith("_row-")]


def test_partitioned_and_column_mapped(spark, tmp_path):
    df = spark.range(12).selectExpr("id", "id % 3 AS p", "id * 2 AS v")
    path = str(tmp_path / "pm")
    write_deltalake(
        path,
        df,
        partition_by=["p"],
        configuration={**CFG, "delta.columnMapping.mode": "name"},
        max_records_per_file=3,
    )
    dt = DeltaTable(path, spark=spark)
    v0 = _ids(dt)
    assert sorted(x[0] for x in v0.values()) == list(range(12))
    dt.delete("id % 4 = 2")
    dt = DeltaTable(path, spark=spark)
    v1 = _ids(dt)
    assert v1 == {k: v for k, v in v0.items() if k % 4 != 2}
    dt.optimize.compact()
    dt = DeltaTable(path, spark=spark)
    assert _ids(dt) == v1


def test_restore_revives_old_ids_without_reuse(spark, tmp_path):
    path = str(tmp_path / "r")
    dt = _table(spark, path, n=6, files=2)
    v0 = _ids(dt)
    dt.delete("id >= 3")
    write_deltalake(
        path, spark.range(4).selectExpr("id + 50 AS id", "id AS v"), mode="append"
    )
    dt = DeltaTable(path, spark=spark)
    dt.restore(1)  # back to post-delete state
    dt = DeltaTable(path, spark=spark)
    ids = _ids(dt)
    assert ids == {k: v for k, v in v0.items() if k < 3}
    # fresh appends must NOT reuse the (now dead) ids 6..9
    write_deltalake(
        path, spark.range(2).selectExpr("id + 90 AS id", "id AS v"), mode="append"
    )
    dt = DeltaTable(path, spark=spark)
    new_ids = {k: v for k, v in _ids(dt).items() if k >= 90}
    assert all(rid >= 10 for rid, _ in new_ids.values())


def test_requires_stats_and_read_gate(spark, tmp_path):
    from delta_rs_spark.log.commit import DeltaError

    plain = str(tmp_path / "plain")
    write_deltalake(plain, spark.range(3).selectExpr("id", "id AS v"))
    with pytest.raises(DeltaError, match="row tracking"):
        DeltaTable(plain, spark=spark).to_df_with_row_ids()

    # predicate + column projection on the row-id read: same mapping as
    # the full scan (file->base assignment order is not row-value order)
    dt = _table(spark, tmp_path / "t", n=10, files=2)
    full = {r["id"]: r["_row_id"] for r in dt.to_df_with_row_ids().collect()}
    rows = dt.to_df_with_row_ids(predicate="id >= 6", columns=["id"]).collect()
    assert {r["id"]: r["_row_id"] for r in rows} == {
        k: v for k, v in full.items() if k >= 6
    }


def test_clone_preserves_ids_and_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    dt = _table(spark, src, n=8, files=2)
    dt.update({"v": "v + 5"}, predicate="id < 3")  # materialize some ids
    dt = DeltaTable(src, spark=spark)
    src_ids = _ids(dt)
    wm_src = json.loads(dt._snapshot.domain_metadata[rt.DOMAIN].configuration)[
        "rowIdHighWaterMark"
    ]

    from delta_rs_spark.operators.clone import clone_table

    dst = str(tmp_path / "dst")
    clone_table(src, dst)
    cdt = DeltaTable(dst, spark=spark)
    assert _ids(cdt) == src_ids  # identity travels with the clone
    wm_dst = json.loads(
        cdt._snapshot.domain_metadata[rt.DOMAIN].configuration
    )["rowIdHighWaterMark"]
    assert wm_dst == wm_src
    # fresh appends on the clone allocate ABOVE the copied watermark —
    # never colliding with ids materialized inside the shared files
    write_deltalake(
        dst, spark.range(3).selectExpr("id + 70 AS id", "id AS v"), mode="append"
    )
    cdt = DeltaTable(dst, spark=spark)
    ids = [x[0] for x in _ids(cdt).values()]
    assert len(set(ids)) == len(ids)
    assert min(x[0] for k, x in _ids(cdt).items() if k >= 70) > wm_src


def test_midlife_enablement_backfills(spark, tmp_path):
    """SET TBLPROPERTIES delta.enableRowTracking=true on a live table:
    the SAME commit assigns materialized column names, upgrades the
    protocol, and backfills baseRowId onto every existing file."""
    path = str(tmp_path / "mid")
    write_deltalake(
        path,
        spark.range(9).selectExpr("id", "id AS v"),
        max_records_per_file=3,
    )
    dt = DeltaTable(path, spark=spark)
    assert all(a.base_row_id is None for a in dt._snapshot.files.values())
    dt.alter.set_table_properties({"delta.enableRowTracking": "true"})
    dt = DeltaTable(path, spark=spark)
    proto = dt._snapshot.protocol
    assert "rowTracking" in proto.writer_features
    assert rt.MAT_ID_KEY in dt._snapshot.configuration
    assert all(a.base_row_id is not None for a in dt._snapshot.files.values())
    ids = _ids(dt)
    assert sorted(x[0] for x in ids.values()) == list(range(9))
    # and the whole lifecycle works post-enablement
    dt.delete("id = 4")
    dt = DeltaTable(path, spark=spark)
    assert _ids(dt) == {k: v for k, v in ids.items() if k != 4}


def test_custom_materialized_names_stay_hidden(spark, tmp_path):
    """r12 ADVICE: the stats-stripping (writer.py) and CDF-dropping
    (cdc.py) hygiene must resolve the CONFIGURED
    delta.rowTracking.materialized*ColumnName values — a foreign writer
    may name the hidden columns without our '_row-id-col-' prefix."""
    path = str(tmp_path / "cn")
    custom = {
        "delta.rowTracking.materializedRowIdColumnName": "hidden_rid",
        "delta.rowTracking.materializedRowCommitVersionColumnName": "hidden_rcv",
    }
    dt = _table(
        spark, path, n=8, files=2,
        extra_cfg={"delta.enableChangeDataFeed": "true", **custom},
    )
    cfg = dt._snapshot.configuration
    assert rt.materialized_names(cfg) == ("hidden_rid", "hidden_rcv")

    v0 = _ids(dt)
    dt.delete("id = 1")  # rewrite: materializes the hidden columns
    dt.update({"v": "v + 1"}, predicate="id = 2")
    dt = DeltaTable(path, spark=spark)
    # row ids stayed stable through the rewrites under the custom names
    # (commit versions move for rewritten rows; ids never do)
    v1 = _ids(dt)
    assert {k: v[0] for k, v in v1.items()} == {
        k: v[0] for k, v in v0.items() if k != 1
    }
    cdf = dt.load_cdf(starting_version=1)
    assert "hidden_rid" not in cdf.columns
    assert "hidden_rcv" not in cdf.columns
    for a in dt._snapshot.files.values():
        st = a.stats_dict() or {}
        for sect in ("minValues", "maxValues", "nullCount"):
            assert "hidden_rid" not in st.get(sect, {})
            assert "hidden_rcv" not in st.get(sect, {})
