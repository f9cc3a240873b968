"""Incremental IVF index maintenance (operators/index_sync.py
sync_ivf_index, r11): the ANN index behind hybrid_topk's default dense
backend must track embedding churn at O(changes) cost — the same
CDF/diff + MERGE + atomic-watermark loop the fingerprint and band
indexes already have. What must hold: post-sync index ≡ frozen-centroid
rebuild of the CURRENT corpus (ids, vectors, AND list assignment), a
vector that moved nearer a different centroid physically migrates
partitions, replayed syncs are no-ops, the no-CDF diff leg sees only
the indexed column, drift triggers (and 'auto' executes) a recluster,
and the lazy first-build race loses LOUDLY then recovers as a reader.
"""

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.functions.similarity import (
    _IVF_CENTROIDS_KEY,
    build_ivf_index,
    frozen_centroid_assigner,
)
from delta_rs_spark.log.commit import DeltaError
from delta_rs_spark.operators.index_sync import (
    ivf_index_balance,
    sync_ivf_index,
)


def _emb(spark, n=120, dim=8, offset=0):
    """Deterministic unit-ish vectors spread around the circle in the
    first two dims (distinct centroids, stable assignment gaps)."""
    rows = [
        (
            i + offset,
            [math.cos(0.1 * i + 0.01 * d) for d in range(dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _index_equals_rebuild(spark, src, idx):
    cur = DeltaTable(src, spark=spark).to_df()
    cents = json.loads(
        DeltaTable(idx, spark=spark).metadata().configuration[
            _IVF_CENTROIDS_KEY
        ]
    )
    assign = frozen_centroid_assigner(cents)
    expect = cur.select(
        F.col("vec_id").alias("id"),
        assign(F.col("embedding")).alias("elist"),
        F.col("embedding").alias("evec"),
    )
    got = DeltaTable(idx, spark=spark).to_df().select("id", "list", "vec")
    j = got.join(expect, "id", "full_outer")
    bad = j.filter(
        "list IS NULL OR elist IS NULL OR list != elist OR NOT (vec <=> evec)"
    ).count()
    assert bad == 0, f"{bad} index rows diverge from a frozen rebuild"
    assert got.count() == cur.count()


def _churn(spark, src, base):
    dt = DeltaTable(src, spark=spark)
    dt.delete("vec_id % 7 = 0")
    dt.update(
        {"embedding": "reverse(embedding)"}, predicate="vec_id % 5 = 0"
    )
    write_deltalake(
        src,
        base.filter("vec_id % 3 = 0").select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.reverse("embedding").alias("embedding"),
        ),
        mode="append",
    )


def test_ivf_sync_cdf_leg_matches_frozen_rebuild(spark, tmp_path):
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    base = _emb(spark)
    write_deltalake(
        src, base, configuration={"delta.enableChangeDataFeed": "true"}
    )
    r = sync_ivf_index(spark, src, idx, n_lists=8)
    assert r["initialized"] and r["applied_through"] == 0
    _churn(spark, src, base)
    r = sync_ivf_index(spark, src, idx)
    assert not r["initialized"]
    assert r["applied_through"] == 3
    assert r["n_change_rows"] > 0
    _index_equals_rebuild(spark, src, idx)
    # exactly-once: replay is a no-op, watermark already at latest
    r2 = sync_ivf_index(spark, src, idx)
    assert r2["n_change_rows"] == 0 and r2["applied_through"] == 3
    assert (
        DeltaTable(idx, spark=spark).transaction_version(
            f"delta-rs-spark/ivf-index:{os.path.abspath(idx)}"
        )
        == 3
    )


def test_ivf_sync_nocdf_diff_leg_and_unrelated_column(spark, tmp_path):
    """auto resolves to the table_diff reconstruction when the source
    never enabled CDF; the diff compares ONLY the vector column, so an
    unrelated-column rewrite produces ZERO index churn."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    base = _emb(spark).withColumn("label", F.col("vec_id") % 3)
    write_deltalake(src, base)  # NO CDF property
    sync_ivf_index(spark, src, idx, n_lists=8)
    _churn(spark, src, base.drop("label"))
    # schema evolved mid-churn is out of scope here; re-align: append
    # had no label column -> rewrite churn only touched embedding/rows
    r = sync_ivf_index(spark, src, idx)
    assert r["n_change_rows"] > 0
    _index_equals_rebuild(spark, src, idx)
    # unrelated-column UPDATE: label flips, embeddings untouched
    DeltaTable(src, spark=spark).update(
        {"label": "label + 10"}, predicate="vec_id % 2 = 0"
    )
    r = sync_ivf_index(spark, src, idx)
    assert r["n_change_rows"] == 0, (
        "metadata-only rewrite must produce no index churn "
        f"(got {r['n_change_rows']})"
    )
    _index_equals_rebuild(spark, src, idx)


def test_ivf_sync_updated_vector_migrates_list_partition(spark, tmp_path):
    """A re-embedded vector whose nearest frozen centroid changed must
    physically move to the new list's partition (the MERGE rewrites it
    under the new partition value), and file skipping must serve it
    from there."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    base = _emb(spark, n=60)
    write_deltalake(
        src, base, configuration={"delta.enableChangeDataFeed": "true"}
    )
    sync_ivf_index(spark, src, idx, n_lists=4)
    before = {
        r["id"]: r["list"]
        for r in DeltaTable(idx, spark=spark).to_df().collect()
    }
    # reverse ALL vectors: most assignments change
    DeltaTable(src, spark=spark).update({"embedding": "reverse(embedding)"})
    sync_ivf_index(spark, src, idx)
    t = DeltaTable(idx, spark=spark)
    after = {r["id"]: r["list"] for r in t.to_df().collect()}
    moved = [i for i in before if before[i] != after[i]]
    assert moved, "reversing every vector should migrate some lists"
    # partition pruning serves the migrated row from its NEW list only
    probe = moved[0]
    got = t.to_df(predicate=f"list = {after[probe]}").filter(
        F.col("id") == probe
    )
    assert got.count() == 1
    gone = t.to_df(predicate=f"list = {before[probe]}").filter(
        F.col("id") == probe
    )
    assert gone.count() == 0, "stale copy survives in the old partition"
    _index_equals_rebuild(spark, src, idx)


def test_ivf_sync_balance_and_auto_recluster(spark, tmp_path):
    """Drift tracking: balance comes from add-action stats only; a
    skew past the threshold flags needs_recluster, and recluster='auto'
    re-trains in place (O(corpus), explicit) keeping the watermark."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    base = _emb(spark, n=80)
    write_deltalake(
        src, base, configuration={"delta.enableChangeDataFeed": "true"}
    )
    sync_ivf_index(spark, src, idx, n_lists=4)
    b0 = ivf_index_balance(idx)
    assert b0["n_lists"] == 4 and b0["n_rows"] == 80
    assert b0["imbalance"] is not None and b0["imbalance"] >= 1.0
    # skew the corpus: append many near-duplicates of one vector so one
    # list swallows the bulk of the rows
    one = base.filter("vec_id = 1").first()["embedding"]
    skew = spark.createDataFrame(
        [(1000 + i, [x + 1e-6 * i for x in one]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    write_deltalake(src, skew, mode="append")
    r = sync_ivf_index(spark, src, idx, imbalance_threshold=1.5)
    assert r["needs_recluster"] and not r["reclustered"]
    # 'auto': a further churned sync re-trains; centroids change and the
    # watermark survives on the rebuild commit
    write_deltalake(
        src,
        spark.createDataFrame(
            [(5000, [float(i) for i in range(8)])],
            "vec_id long, embedding array<double>",
        ),
        mode="append",
    )
    cents_before = DeltaTable(idx, spark=spark).metadata().configuration[
        _IVF_CENTROIDS_KEY
    ]
    r = sync_ivf_index(
        spark, src, idx, imbalance_threshold=1.5, recluster="auto"
    )
    assert r["reclustered"]
    t = DeltaTable(idx, spark=spark)
    assert (
        t.metadata().configuration[_IVF_CENTROIDS_KEY] != cents_before
    ), "auto recluster must re-TRAIN the centroids (k-means), not re-seed"
    # the rebuilt index is consistent with its NEW config centroids
    _index_equals_rebuild(spark, src, idx)
    assert t.transaction_version(
        f"delta-rs-spark/ivf-index:{os.path.abspath(idx)}"
    ) == r["applied_through"]
    # a replayed sync after the rebuild is still a no-op
    r2 = sync_ivf_index(spark, src, idx, imbalance_threshold=1.5)
    assert r2["n_change_rows"] == 0


def test_ivf_first_build_race_loses_loudly_then_reads(spark, tmp_path):
    """r10 verdict note: two processes racing the lazy build at a
    shared path must not silently double-write. The loser's create
    fails (mode='error' / OCC on v0) and sync_ivf_index recovers by
    falling through to the sync path against the winner's index."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    base = _emb(spark, n=40)
    write_deltalake(
        src, base, configuration={"delta.enableChangeDataFeed": "true"}
    )
    # winner commits v0
    r1 = sync_ivf_index(spark, src, idx, n_lists=4)
    assert r1["initialized"]
    # a raw build against the existing path loses LOUDLY
    with pytest.raises(DeltaError):
        build_ivf_index(base, idx, n_lists=4, mode="error")
    # the loser's sync_ivf_index (raced past its own existence check)
    # falls through to the sync path: emulate the interleaving by
    # letting its FIRST existence probe report "absent" (the pre-race
    # view) so its build attempt hits the winner's v0 and fails
    real_desc = DeltaTable.__dict__["is_deltatable"]
    real_fn = DeltaTable.is_deltatable
    calls = {"n": 0}

    def flaky_is_delta(path):
        calls["n"] += 1
        if calls["n"] == 1 and os.path.abspath(path) == os.path.abspath(idx):
            return False
        return real_fn(path)

    try:
        DeltaTable.is_deltatable = staticmethod(flaky_is_delta)
        r2 = sync_ivf_index(spark, src, idx, n_lists=4)
    finally:
        DeltaTable.is_deltatable = real_desc
    assert not r2["initialized"]
    assert r2["applied_through"] == r1["applied_through"]
    # index unchanged: still exactly one row per source row
    assert DeltaTable(idx, spark=spark).to_df().count() == 40


def test_hybrid_topk_source_path_routes_through_synced_index(
    spark, tmp_path
):
    """hybrid_topk(dense='ivf', source_path=...) keeps the dense
    ranking CURRENT: after churn on the source embedding table, a
    deleted vector disappears from the dense candidates and appended
    vectors become retrievable — without an O(corpus) rebuild."""
    from delta_rs_spark.functions.retrieval import hybrid_topk

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    write_deltalake(
        src, emb, configuration={"delta.enableChangeDataFeed": "true"}
    )
    from delta_rs_spark.functions.retrieval import head_term_queries

    qs = head_term_queries(docs, n_queries=2, n_terms=4)
    qvecs = emb.filter("vec_id IN (1, 2)")

    def run():
        cur = DeltaTable(src, spark=spark).to_df()
        return hybrid_topk(
            docs,
            cur,
            qs,
            qvecs,
            index_path=idx,
            source_path=src,
            k=10,
            topk=10,
        )

    first = run().collect()
    assert first
    # take down the top dense hit of query 1 and re-run: the synced
    # index must stop serving it
    top_doc = next(r["doc_id"] for r in first if r["query_id"] == 1)
    DeltaTable(src, spark=spark).delete(f"vec_id = {top_doc}")
    second = run().collect()
    assert all(
        not (r["query_id"] == 1 and r["doc_id"] == top_doc) for r in second
    ), "deleted vector still served from a stale index"
