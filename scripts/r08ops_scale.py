"""Scaling-curve measurement for the r08 operators.

  - dense  (dense_topk, 4 fixed queries over a k-scaled embedding
    corpus): one broadcast scan + sharded two-phase top-k — expect
    linear wall, flat per-vector, no corpus-sized sort task
  - contam_full (semantic_contamination, 8-vector bench): |corpus| x 8
    broadcast product + partial-agg max — expect linear
  - contam_pruned (semantic_contamination_indexed over a materialized
    16-list IVF index, n_probe=4; index build excluded as setup):
    the gate shape — NULL-padded to every corpus id, which re-reads
    the id column of the whole index, so it tracks contam_full's scan
  - contam_pruned_np (include_unprobed=False — the scale path): only
    probed partitions are read at all; expect ~n_probe/n_lists of
    contam_full's slope — the pruning win
  - stream_late (the q_events_late_watermark stream body on k-scaled
    events; staging excluded as setup): a REAL availableNow stream
    with state store — expect linear in events over a commit/state
    floor

Corpus scaling = salted copies (constant density), same as the other
curve scripts. Discard-the-first-row rule applies (JIT warm-up) — a
warm-up pass at k=1 runs before measurement.

Usage: python scripts/r08ops_scale.py [k ...]   (default 1 2 4 8)
Prints a markdown table (paste into COVERAGE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.functions.similarity import (
    build_ivf_index,
    dense_topk,
    semantic_contamination,
    semantic_contamination_indexed,
)
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table
from delta_rs_spark.streaming.windows import tumbling_cents

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/delta_rs_spark_scale/r08ops"


def scaled_embeddings(spark, k: int):
    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    copies = [
        base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(float(i) * 1e-5)
            ).alias("embedding"),
        )
        for i in range(k)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.union(c)
    return df.repartition(min(32, max(2, k * 4)))


def scaled_events(spark, k: int):
    base = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts_ts", "event_type", "value"
    )
    copies = [
        base.select(
            (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
            "ts_ts",
            "event_type",
            "value",
        )
        for i in range(k)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.union(c)
    return df.repartition(min(32, max(2, k * 4)))


def timed(fn) -> float:
    """min-of-2 (shared-machine noise showed up as whole-row spikes in
    single-sample runs — same rationale as bench.py's min-of-3)."""
    best = None
    for _ in range(2):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def stage_late_stream(spark, events, tag: str) -> str:
    """The q_events_late_watermark staging (setup, untimed): 3
    time-chunk files, every 50th event displaced into the last."""
    sec = F.floor(F.unix_timestamp("ts_ts")).cast("long")
    base = events.select(
        "event_id", "ts_ts", "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        sec.alias("sec"),
    )
    bounds = base.agg(F.min("sec").alias("mn"), F.max("sec").alias("mx"))
    arr = F.when(F.col("event_id") % 50 == 0, F.lit(2).cast("long")).otherwise(
        F.least(F.expr("((sec - mn) * 3) div (mx - mn + 1)"), F.lit(2).cast("long"))
    )
    staged = base.crossJoin(F.broadcast(bounds)).select(
        "ts_ts", "event_type", "cents", arr.alias("arr")
    )
    root = f"{ROOT}/{tag}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(f"{root}/in", exist_ok=True)
    for b in (0, 1, 2):
        stg = f"{root}/stage{b}"
        staged.filter(F.col("arr") == b).select(
            "ts_ts", "event_type", "cents"
        ).coalesce(1).write.parquet(stg)
        part = next(p for p in os.listdir(stg) if p.endswith(".parquet"))
        dst = f"{root}/in/b{b}.parquet"
        os.rename(f"{stg}/{part}", dst)
        shutil.rmtree(stg, ignore_errors=True)
        os.utime(dst, (1_600_000_000 + b * 100,) * 2)
    return root


_SEQ = 0


def run_late_stream(spark, root: str) -> float:
    global _SEQ
    _SEQ += 1
    sink = f"r08_scale_late_{os.getpid()}_{_SEQ}"
    src = (
        spark.readStream.schema("ts_ts timestamp, event_type string, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/in")
    )
    t0 = time.time()
    q = (
        tumbling_cents(src, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", f"{root}/ckpt{_SEQ}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return round(time.time() - t0, 2)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = get_spark("r08ops-scale")

    # warm-up at k=1 (JIT/codegen; first measured row otherwise absorbs it)
    emb1 = scaled_embeddings(spark, 1).localCheckpoint()
    bench = emb1.filter(F.col("vec_id") < 8).localCheckpoint()
    qvecs = emb1.filter(F.col("vec_id") < 4).localCheckpoint()
    dense_topk(emb1, qvecs, k=20, q_id_col="vec_id").write.format("noop").mode(
        "overwrite"
    ).save()
    semantic_contamination(emb1, bench).write.format("noop").mode("overwrite").save()
    idx_w = f"{ROOT}/idx_warm"
    shutil.rmtree(idx_w, ignore_errors=True)
    build_ivf_index(emb1, idx_w, n_lists=16)
    semantic_contamination_indexed(spark, idx_w, bench).write.format("noop").mode(
        "overwrite"
    ).save()
    run_late_stream(spark, stage_late_stream(spark, scaled_events(spark, 1), "warm"))
    emb1.unpersist()

    rows = []
    for k in ks:
        emb = scaled_embeddings(spark, k).localCheckpoint()
        n = emb.count()
        rec = {"k": k, "n_vecs": n}
        rec["dense"] = timed(
            lambda: dense_topk(emb, qvecs, k=20, q_id_col="vec_id")
        )
        idx = f"{ROOT}/idx_k{k}"
        shutil.rmtree(idx, ignore_errors=True)
        build_ivf_index(emb, idx, n_lists=16)  # setup, untimed
        # apples-to-apples: BOTH variants read the same Delta table
        # (brute force over an in-memory checkpoint would understate
        # the scan cost the pruning removes). First read of a freshly
        # WRITTEN table pays footer/page-cache costs a steady-state
        # monitor never re-pays (measured 10.4s -> 3.0s on the same
        # index): warm each path once, untimed, then time steady state.
        from delta_rs_spark.table import DeltaTable

        tbl = DeltaTable(idx, spark=spark)
        full_src = tbl.to_df(columns=["id", "vec"]).select(
            F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
        )
        semantic_contamination(full_src, bench).write.format("noop").mode(
            "overwrite"
        ).save()
        rec["contam_full"] = timed(
            lambda: semantic_contamination(full_src, bench)
        )
        semantic_contamination_indexed(spark, idx, bench).write.format(
            "noop"
        ).mode("overwrite").save()
        rec["contam_pruned"] = timed(
            lambda: semantic_contamination_indexed(spark, idx, bench)
        )
        rec["contam_pruned_np"] = timed(
            lambda: semantic_contamination_indexed(
                spark, idx, bench, include_unprobed=False
            )
        )
        ev = scaled_events(spark, k)
        rec["n_events"] = ev.count()
        root = stage_late_stream(spark, ev, f"k{k}")
        rec["stream_late"] = min(
            run_late_stream(spark, root), run_late_stream(spark, root)
        )
        emb.unpersist()
        rows.append(rec)
        print(f"done k={k}: {rec}", file=sys.stderr)

    names = ["dense", "contam_full", "contam_pruned", "contam_pruned_np", "stream_late"]
    print("| k | vecs | events | " + " | ".join(f"{n} s" for n in names) + " |")
    print("|---" * (3 + len(names)) + "|")
    for r in rows:
        print(
            f"| {r['k']} | {r['n_vecs']} | {r['n_events']} | "
            + " | ".join(f"{r[n]:.2f}" for n in names)
            + " |"
        )


if __name__ == "__main__":
    main()
