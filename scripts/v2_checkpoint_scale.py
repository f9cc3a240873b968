"""V2 vs classic checkpoint cost as the file count grows.

The 100 TB argument for V2 checkpoints is structural (a classic
checkpoint of millions of add actions is ONE serial parquet write and
ONE serial read on every cold snapshot load; sidecars cap each file so
an object store can write and a reader pool can fetch them in
parallel). This script measures what IS observable locally: write
time, cold snapshot-load time, and the size split between the
top-level checkpoint and its sidecars, classic vs V2, as the add-action
count grows 16x — pinning that the V2 layout costs ~nothing at small
scale while bounding every file at large scale.

Usage: python scripts/v2_checkpoint_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from delta_rs_spark import DeltaTable, write_deltalake  # noqa: E402
from delta_rs_spark.log import snapshot as snap_mod  # noqa: E402

ROOT = f"/tmp/v2cp_scale_{os.getpid()}"


def build(spark, n_files: int) -> str:
    path = os.path.join(ROOT, f"t{n_files}")
    shutil.rmtree(path, ignore_errors=True)
    rows = n_files * 100
    df = spark.range(rows).selectExpr("id", "id * 2 AS v").repartition(1)
    write_deltalake(path, df, max_records_per_file=100)
    DeltaTable(path, spark=spark).alter.add_feature(["v2Checkpoint"])
    return path


def timed_load(path: str) -> float:
    t0 = time.time()
    snap = snap_mod.load_snapshot(path)
    dt = time.time() - t0
    assert snap.files
    return dt


def du(p: str) -> int:
    return os.path.getsize(p) if os.path.isfile(p) else sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p)
        for f in fs
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("v2cp-scale")
        .getOrCreate()
    )
    print("| files | classic write s | classic load s | classic bytes | v2 write s | v2 load s | top bytes | sidecar bytes | sidecars |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n_files in (64, 256, 1024):
        path = build(spark, n_files)
        dt = DeltaTable(path, spark=spark)

        t0 = time.time()
        cp = snap_mod.write_checkpoint(path, dt._snapshot)
        t_classic_w = time.time() - t0
        t_classic_r = timed_load(path)
        classic_bytes = du(cp)
        os.unlink(cp)

        t0 = time.time()
        cp2 = snap_mod.write_checkpoint(
            path, dt._snapshot, v2=True, sidecar_target_actions=max(1, n_files // 8)
        )
        t_v2_w = time.time() - t0
        t_v2_r = timed_load(path)
        sc_dir = os.path.join(path, "_delta_log", "_sidecars")
        n_sc = len(os.listdir(sc_dir))
        print(
            f"| {n_files} | {t_classic_w:.2f} | {t_classic_r:.2f} | "
            f"{classic_bytes:,} | {t_v2_w:.2f} | {t_v2_r:.2f} | "
            f"{du(cp2):,} | {du(sc_dir):,} | {n_sc} |",
            flush=True,
        )
    shutil.rmtree(ROOT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
