"""Identity columns (PROTOCOL.md "Identity Columns"): generation,
watermark persistence, multi-partition uniqueness, GENERATED ALWAYS vs
BY DEFAULT, UPDATE/MERGE guards, concurrent-writer conflict."""

import json
import threading

import pytest
from pyspark.sql import types as T

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.log.commit import DeltaError
from delta_rs_spark.plans import identity as ident


def _schema(start=1, step=1, allow=False):
    meta = {"delta.identity.start": start, "delta.identity.step": step}
    if allow:
        meta["delta.identity.allowExplicitInsert"] = True
    return T.StructType(
        [
            T.StructField("uid", T.LongType(), True, meta),
            T.StructField("v", T.LongType(), True),
        ]
    )


def _hwm(dt):
    sch = json.loads(dt._snapshot.schema_string)
    f = next(f for f in sch["fields"] if f["name"] == "uid")
    return f["metadata"].get("delta.identity.highWaterMark")


def test_generation_progression_and_watermark(spark, tmp_path):
    path = str(tmp_path / "t")
    DeltaTable.create(path, _schema(start=10, step=3), spark=spark)
    dt = DeltaTable(path, spark=spark)
    assert "identityColumns" in dt._snapshot.protocol.writer_features

    write_deltalake(path, spark.range(6).selectExpr("id AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    uids = sorted(r["uid"] for r in dt.to_df().collect())
    assert len(set(uids)) == 6
    assert all(u >= 10 and (u - 10) % 3 == 0 for u in uids)
    assert _hwm(dt) == max(uids)

    # second append stays strictly beyond the persisted watermark
    prev_max = max(uids)
    write_deltalake(path, spark.range(4).selectExpr("id + 50 AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    uids2 = [r["uid"] for r in dt.to_df().collect()]
    assert len(set(uids2)) == 10
    new = set(uids2) - set(uids)
    assert all(u > prev_max and (u - 10) % 3 == 0 for u in new)
    assert _hwm(dt) == max(uids2)


def test_multi_partition_uniqueness(spark, tmp_path):
    path = str(tmp_path / "mp")
    DeltaTable.create(path, _schema(), spark=spark)
    df = spark.range(500).selectExpr("id AS v").repartition(8)
    write_deltalake(path, df, mode="append", max_records_per_file=50)
    dt = DeltaTable(path, spark=spark)
    uids = [r["uid"] for r in dt.to_df().collect()]
    assert len(set(uids)) == 500
    assert all(u >= 1 and (u - 1) % 1 == 0 for u in uids)
    # sparse-but-safe scheme (r12): k = monotonically_increasing_id(),
    # unique under ANY runtime partition count (AQE may execute the
    # write with more partitions than any plan-time probe saw); the
    # protocol allows the resulting 2^33-per-partition gaps
    assert _hwm(dt) == max(uids)
    # a second multi-partition append still lands strictly beyond
    write_deltalake(
        path,
        spark.range(100).selectExpr("id AS v").repartition(8),
        mode="append",
    )
    dt = DeltaTable(path, spark=spark)
    uids2 = [r["uid"] for r in dt.to_df().collect()]
    assert len(set(uids2)) == 600
    assert all(u > max(uids) for u in set(uids2) - set(uids))


def test_negative_step(spark, tmp_path):
    path = str(tmp_path / "neg")
    DeltaTable.create(path, _schema(start=0, step=-2), spark=spark)
    write_deltalake(path, spark.range(5).selectExpr("id AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    uids = sorted(r["uid"] for r in dt.to_df().collect())
    assert all(u <= 0 and u % 2 == 0 for u in uids)
    assert _hwm(dt) == min(uids)  # watermark moves in step direction
    write_deltalake(path, spark.range(3).selectExpr("id AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    uids2 = [r["uid"] for r in dt.to_df().collect()]
    assert len(set(uids2)) == 8


def test_generated_always_vs_by_default(spark, tmp_path):
    always = str(tmp_path / "al")
    DeltaTable.create(always, _schema(), spark=spark)
    with pytest.raises(DeltaError, match="GENERATED ALWAYS"):
        write_deltalake(
            always,
            spark.range(2).selectExpr("id AS uid", "id AS v"),
            mode="append",
        )

    bydef = str(tmp_path / "bd")
    DeltaTable.create(bydef, _schema(start=1, step=1, allow=True), spark=spark)
    # explicit insert accepted AND syncs the watermark over it
    write_deltalake(
        bydef,
        spark.range(3).selectExpr("id + 1000 AS uid", "id AS v"),
        mode="append",
    )
    dt = DeltaTable(bydef, spark=spark)
    assert _hwm(dt) == 1002
    # generation then continues beyond the synced mark
    write_deltalake(bydef, spark.range(2).selectExpr("id + 90 AS v"), mode="append")
    dt = DeltaTable(bydef, spark=spark)
    gen = [r["uid"] for r in dt.to_df(predicate="v >= 90").collect()]
    assert all(u > 1002 for u in gen)


def test_update_and_merge_guards(spark, tmp_path):
    path = str(tmp_path / "g")
    DeltaTable.create(path, _schema(), spark=spark)
    write_deltalake(path, spark.range(4).selectExpr("id AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    with pytest.raises(DeltaError, match="identity column"):
        dt.update({"uid": "1"}, predicate="v = 0")
    # ALWAYS: explicit assignment in an insert clause is still rejected
    src_with_uid = spark.range(2).selectExpr("id + 10 AS v", "id + 9000 AS uid")
    with pytest.raises(DeltaError, match="GENERATED ALWAYS"):
        (
            dt.merge(src_with_uid, "t.v = s.v", source_alias="s", target_alias="t")
            .when_not_matched_insert_all()
            .execute()
        )
    src = spark.range(2).selectExpr("id AS v")
    # matched-update of non-identity columns stays allowed
    dt.merge(src, "t.v = s.v", source_alias="s", target_alias="t").when_matched_update(
        {"v": "s.v + 100"}
    ).execute()
    dt = DeltaTable(path, spark=spark)
    assert sorted(r["v"] for r in dt.to_df().collect()) == [2, 3, 100, 101]
    # ids unchanged by the merge rewrite
    assert len({r["uid"] for r in dt.to_df().collect()}) == 4

    bydef = str(tmp_path / "gbd")
    DeltaTable.create(bydef, _schema(allow=True), spark=spark)
    write_deltalake(bydef, spark.range(2).selectExpr("id AS v"), mode="append")
    dtb = DeltaTable(bydef, spark=spark)
    src2 = spark.range(2).selectExpr("id + 10 AS v")
    # r12 (delta-spark parity): an unassigned identity column GENERATES
    # on merge-insert instead of rejecting
    (
        dtb.merge(src2, "t.v = s.v", source_alias="s", target_alias="t")
        .when_not_matched_insert({"v": "s.v"})
        .execute()
    )
    dtb = DeltaTable(bydef, spark=spark)
    assert dtb.to_df().count() == 4
    assert len({r["uid"] for r in dtb.to_df().collect()}) == 4
    (
        dtb.merge(
            spark.range(2).selectExpr("id + 20 AS v"),
            "t.v = s.v", source_alias="s", target_alias="t",
        )
        .when_not_matched_insert({"v": "s.v", "uid": "s.v + 5000"})
        .execute()
    )
    dtb = DeltaTable(bydef, spark=spark)
    assert dtb.to_df().count() == 6
    # watermark synced over everything that landed (explicit + generated)
    assert _hwm(dtb) == max(r["uid"] for r in dtb.to_df().collect())


def test_merge_insert_generates_identity(spark, tmp_path):
    """r12 (VERDICT r11 #2, delta-spark parity): merge-insert generates
    unassigned identity columns for BOTH ALWAYS and BY DEFAULT — values
    are progression members strictly beyond the pre-merge watermark,
    unique, and the watermark advances in the SAME commit."""
    path = str(tmp_path / "mig")
    DeltaTable.create(path, _schema(start=100, step=7), spark=spark)
    write_deltalake(path, spark.range(3).selectExpr("id AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    hwm0 = _hwm(dt)
    v_before = {r["v"]: r["uid"] for r in dt.to_df().collect()}

    src = spark.range(6).selectExpr("id AS v")  # 0-2 match, 3-5 insert
    m = (
        dt.merge(src, "t.v = s.v", source_alias="s", target_alias="t")
        .when_matched_update({"v": "s.v + 50"})
        .when_not_matched_insert_all()
        .execute()
    )
    assert m["num_target_rows_inserted"] == 3
    dt = DeltaTable(path, spark=spark)
    rows = {r["v"]: r["uid"] for r in dt.to_df().collect()}
    # matched rows kept their ids through the rewrite
    assert {rows[v + 50] for v in (0, 1, 2)} == set(v_before.values())
    gen = [rows[v] for v in (3, 4, 5)]
    assert len(set(gen)) == 3
    assert all(u > hwm0 and (u - 100) % 7 == 0 for u in gen)
    # watermark advanced in the same commit (no follow-up commit)
    assert _hwm(dt) == max(gen)
    assert dt.version() == 2  # create + append + merge

    # generation continues beyond the merge's watermark on later appends
    write_deltalake(path, spark.range(2).selectExpr("id + 90 AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    more = [r["uid"] for r in dt.to_df(predicate="v >= 90").collect()]
    assert all(u > max(gen) for u in more)

    # multi-clause: one clause explicit (BY DEFAULT), one generated
    bydef = str(tmp_path / "migbd")
    DeltaTable.create(bydef, _schema(start=1, step=1, allow=True), spark=spark)
    write_deltalake(bydef, spark.range(2).selectExpr("id AS v"), mode="append")
    dtb = DeltaTable(bydef, spark=spark)
    hwmb = _hwm(dtb)
    srcb = spark.range(4).selectExpr("id + 10 AS v")
    (
        dtb.merge(srcb, "t.v = s.v", source_alias="s", target_alias="t")
        .when_not_matched_insert(
            {"v": "s.v", "uid": "s.v + 7000"}, predicate="s.v % 2 = 0"
        )
        .when_not_matched_insert({"v": "s.v"})
        .execute()
    )
    dtb = DeltaTable(bydef, spark=spark)
    got = {r["v"]: r["uid"] for r in dtb.to_df().collect()}
    assert got[10] == 7010 and got[12] == 7012  # explicit clause
    assert got[11] > hwmb and got[13] > hwmb  # generated clause
    assert len(set(got.values())) == 6
    # watermark synced over everything that landed in the one commit
    assert _hwm(dtb) == max(got.values())


def test_concurrent_identity_writers_conflict_loudly(spark, tmp_path):
    """Both racing appends update the Metadata watermark — the loser
    must surface MetadataChangedError, never silently double-allocate."""
    from delta_rs_spark.log.commit import MetadataChangedError

    path = str(tmp_path / "race")
    DeltaTable.create(path, _schema(), spark=spark)
    barrier = threading.Barrier(2)
    outcomes = []

    def writer(tag):
        try:
            df = spark.range(4).selectExpr(f"id + {tag * 100} AS v")
            barrier.wait()
            write_deltalake(path, df, mode="append")
            outcomes.append("ok")
        except MetadataChangedError:
            outcomes.append("conflict")
        except Exception as e:  # pragma: no cover
            outcomes.append(f"other:{e}")

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(outcomes) in (["conflict", "ok"], ["ok", "ok"])
    dt = DeltaTable(path, spark=spark)
    uids = [r["uid"] for r in dt.to_df().collect()]
    assert len(set(uids)) == len(uids)  # no double allocation either way


def test_zero_step_rejected(spark, tmp_path):
    path = str(tmp_path / "z")
    DeltaTable.create(path, _schema(step=0), spark=spark)
    with pytest.raises(DeltaError, match="nonzero"):
        write_deltalake(path, spark.range(1).selectExpr("id AS v"), mode="append")


def test_identity_under_column_mapping(spark, tmp_path):
    """Identity + columnMapping: the parquet files and stats carry
    physical col-<uuid> names — generation and the watermark lookup must
    translate. Also pins the stats-excluded fallback scan (the identity
    column is kept OUT of the skipping stats, so the watermark can only
    come from the column-pruned scan of the new files)."""
    path = str(tmp_path / "cm")
    schema = T.StructType(
        [
            T.StructField(
                "uid", T.LongType(), True,
                {"delta.identity.start": 5, "delta.identity.step": 2},
            ),
            T.StructField("v", T.LongType(), True),
        ]
    )
    DeltaTable.create(
        path,
        schema,
        configuration={
            "delta.columnMapping.mode": "name",
            "delta.dataSkippingStatsColumns": "v",  # uid has NO stats
        },
        spark=spark,
    )
    write_deltalake(path, spark.range(5).selectExpr("id AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    uids = sorted(r["uid"] for r in dt.to_df().collect())
    assert len(set(uids)) == 5 and all((u - 5) % 2 == 0 for u in uids)
    assert _hwm(dt) == max(uids)
    write_deltalake(path, spark.range(3).selectExpr("id + 50 AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    all_uids = [r["uid"] for r in dt.to_df().collect()]
    assert len(set(all_uids)) == 8
    assert _hwm(dt) == max(all_uids)


def test_merge_update_all_cannot_smuggle_identity(spark, tmp_path):
    """when_matched_update_all expands AFTER validation used to run — a
    source carrying the identity column must still be rejected, and
    except_cols is the sanctioned escape hatch."""
    path = str(tmp_path / "ua")
    DeltaTable.create(path, _schema(), spark=spark)
    write_deltalake(path, spark.range(3).selectExpr("id AS v"), mode="append")
    dt = DeltaTable(path, spark=spark)
    before = {r["v"]: r["uid"] for r in dt.to_df().collect()}
    src = spark.range(3).selectExpr("id AS v", "id + 9000 AS uid")
    with pytest.raises(DeltaError, match="identity column"):
        (
            dt.merge(src, "t.v = s.v", source_alias="s", target_alias="t")
            .when_matched_update_all()
            .execute()
        )
    (
        dt.merge(
            spark.range(3).selectExpr("id AS v", "id + 9000 AS uid"),
            "t.v = s.v",
            source_alias="s",
            target_alias="t",
        )
        .when_matched_update_all(except_cols=["uid"])
        .execute()
    )
    dt = DeltaTable(path, spark=spark)
    assert {r["v"]: r["uid"] for r in dt.to_df().collect()} == before
