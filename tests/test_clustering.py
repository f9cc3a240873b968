"""Clustered tables (delta-spark liquid clustering; PROTOCOL.md
"Clustered Table"). The reference accepts the clusteredTable feature
(kernel/models/actions.rs:799) and parses the clustering domain
(protocol/mod.rs:717) but never maintains it — parity plane like clone
and identity.

What must hold: CREATE ... CLUSTER BY persists the delta.clustering
domain + features; optimize.cluster() Hilbert-clusters by the persisted
columns INCREMENTALLY (only un-clustered arrivals), stamps
clusteringProvider="liquid" on its outputs, survives checkpoint
round-trips; ALTER CLUSTER BY re-spec's future runs; validation refuses
partitioned/unknown/duplicate columns.
"""

import json

import pytest
from pyspark.sql import functions as F, types as T

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.commit import DeltaError
from delta_rs_spark.plans import clustering as cl


def _schema():
    return T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
        ]
    )


def _df(spark, n=4000):
    return spark.range(n).selectExpr(
        "id AS a", f"({n} - id) AS b", "concat('x', id % 97) AS s"
    )


def test_create_cluster_by_persists_domain_and_features(spark, tmp_path):
    path = str(tmp_path / "t")
    dt = DeltaTable.create(path, _schema(), cluster_by=["a", "b"], spark=spark)
    assert dt.clustering_columns() == ["a", "b"]
    proto = dt.protocol()
    assert "clusteredTable" in (proto.writer_features or [])
    assert "domainMetadata" in (proto.writer_features or [])
    dm = dt._snapshot.domain_metadata[cl.DOMAIN]
    assert json.loads(dm.configuration)["clusteringColumns"] == [["a"], ["b"]]
    h = dt.history(1)[0]
    assert "clusterBy" in h["operationParameters"]

    # validation
    with pytest.raises(DeltaError, match="mutually exclusive"):
        DeltaTable.create(
            str(tmp_path / "p"), _schema(), partition_by=["s"],
            cluster_by=["a"], spark=spark,
        )
    with pytest.raises(DeltaError, match="not in schema"):
        DeltaTable.create(
            str(tmp_path / "m"), _schema(), cluster_by=["nope"], spark=spark
        )
    with pytest.raises(DeltaError, match="distinct"):
        DeltaTable.create(
            str(tmp_path / "d"), _schema(), cluster_by=["a", "a"], spark=spark
        )
    with pytest.raises(DeltaError, match="at most"):
        DeltaTable.create(
            str(tmp_path / "x"),
            T.StructType([T.StructField(c, T.LongType()) for c in "abcde"]),
            cluster_by=list("abcde"), spark=spark,
        )


def test_cluster_incremental_and_provider(spark, tmp_path):
    path = str(tmp_path / "c")
    DeltaTable.create(path, _schema(), cluster_by=["a", "b"], spark=spark)
    write_deltalake(path, _df(spark), mode="append", max_records_per_file=500)
    dt = DeltaTable(path, spark=spark)
    n0 = dt.count()

    m1 = dt.optimize.cluster()
    assert m1["numFilesRemoved"] >= 1 and m1["numFilesAdded"] >= 1
    dt.refresh()
    assert dt.count() == n0
    provs = {a.clustering_provider for a in dt._snapshot.files.values()}
    assert provs == {"liquid"}
    # history records a hilbert clustering OPTIMIZE
    p = dt.history(1)[0]["operationParameters"]
    assert p.get("curve") == "hilbert" and p.get("incremental")

    # incremental: a second run with no arrivals is a no-op
    m2 = dt.optimize.cluster()
    assert m2["numFilesAdded"] == 0
    assert m2["numFilesSkippedAlreadyClustered"] == m1["numFilesAdded"]

    # new arrivals recluster WITHOUT touching the stable cube
    write_deltalake(
        path,
        _df(spark).selectExpr("a + 100000 AS a", "b", "s"),
        mode="append",
        max_records_per_file=500,
    )
    dt = DeltaTable(path, spark=spark)
    m3 = dt.optimize.cluster(min_cube_size=1)
    assert m3["numFilesSkippedAlreadyClustered"] == m1["numFilesAdded"]
    assert m3["numFilesRemoved"] >= 1
    dt.refresh()
    assert dt.count() == 2 * n0
    assert {
        a.clustering_provider for a in dt._snapshot.files.values()
    } == {"liquid"}

    # full=True rewrites everything under one cube
    m4 = dt.optimize.cluster(full=True)
    assert m4["numFilesSkippedAlreadyClustered"] == 0
    assert m4["numFilesRemoved"] == m1["numFilesAdded"] + m3["numFilesAdded"]
    dt.refresh()
    assert dt.count() == 2 * n0


def test_cluster_requires_clustered_table(spark, tmp_path):
    path = str(tmp_path / "plain")
    write_deltalake(path, _df(spark, 100))
    dt = DeltaTable(path, spark=spark)
    with pytest.raises(DeltaError, match="clustered table"):
        dt.optimize.cluster()


def test_alter_cluster_by_and_checkpoint_roundtrip(spark, tmp_path):
    path = str(tmp_path / "alter")
    write_deltalake(path, _df(spark, 2000), max_records_per_file=500)
    dt = DeltaTable(path, spark=spark)
    assert dt.clustering_columns() is None
    dt.alter.set_clustering_columns(["b"])
    dt.refresh()
    assert dt.clustering_columns() == ["b"]
    assert "clusteredTable" in (dt.protocol().writer_features or [])
    m = dt.optimize.cluster()
    assert m["numFilesAdded"] >= 1
    dt.refresh()

    # re-spec: previously clustered files are NOT stable under the new
    # spec, so the next run reclusters them
    dt.alter.set_clustering_columns(["a", "b"])
    dt.refresh()
    assert dt.clustering_columns() == ["a", "b"]
    m2 = dt.optimize.cluster()
    assert m2["numFilesSkippedAlreadyClustered"] == 0
    assert m2["numFilesRemoved"] >= 1

    # provider + domain survive a checkpoint round-trip
    dt.create_checkpoint()
    import os

    log = snap_mod.log_dir(path)
    for f in os.listdir(log):
        if f.endswith(".json"):
            os.unlink(os.path.join(log, f))
    snap = snap_mod.load_snapshot(path)
    assert cl.clustering_columns(snap) == ["a", "b"]
    assert {
        a.clustering_provider for a in snap.files.values()
    } == {"liquid"}
    assert DeltaTable(path, spark=spark).count() == 2000

    # validation against partitioned tables
    ppath = str(tmp_path / "part")
    write_deltalake(
        ppath, _df(spark, 100).withColumn("p", F.col("a") % 2),
        partition_by=["p"],
    )
    with pytest.raises(DeltaError, match="mutually exclusive"):
        DeltaTable(ppath, spark=spark).alter.set_clustering_columns(["a"])


def test_cluster_under_column_mapping(spark, tmp_path):
    """The domain stores PHYSICAL names; reads translate back."""
    path = str(tmp_path / "cm")
    dt = DeltaTable.create(
        path,
        _schema(),
        cluster_by=["a"],
        configuration={"delta.columnMapping.mode": "name"},
        spark=spark,
    )
    dm = json.loads(dt._snapshot.domain_metadata[cl.DOMAIN].configuration)
    phys = dm["clusteringColumns"][0][0]
    assert phys.startswith("col-")  # physical, not logical
    assert dt.clustering_columns() == ["a"]  # translated back
    write_deltalake(path, _df(spark, 1000), mode="append", max_records_per_file=250)
    dt = DeltaTable(path, spark=spark)
    m = dt.optimize.cluster()
    assert m["numFilesAdded"] >= 1
    dt.refresh()
    assert dt.count() == 1000
    assert {
        a.clustering_provider for a in dt._snapshot.files.values()
    } == {"liquid"}


def test_create_by_write_cluster_by(spark, tmp_path):
    """write_deltalake(cluster_by=...) creates a clustered table on the
    defining write; later writes must match or omit the spec."""
    path = str(tmp_path / "wcb")
    write_deltalake(path, _df(spark, 1000), cluster_by=["a"],
                    max_records_per_file=250)
    dt = DeltaTable(path, spark=spark)
    assert dt.clustering_columns() == ["a"]
    assert "clusteredTable" in (dt.protocol().writer_features or [])
    m = dt.optimize.cluster()
    assert m["numFilesAdded"] >= 1

    # matching spec on append is fine; a different one is rejected
    write_deltalake(path, _df(spark, 10), mode="append", cluster_by=["a"])
    with pytest.raises(DeltaError, match="table clustering"):
        write_deltalake(path, _df(spark, 10), mode="append", cluster_by=["b"])
    # partitioned + clustered rejected on create-by-write too
    with pytest.raises(DeltaError, match="mutually exclusive"):
        write_deltalake(
            str(tmp_path / "bad"), _df(spark, 10),
            partition_by=["s"], cluster_by=["a"],
        )
