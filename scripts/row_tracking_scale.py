"""Row tracking overhead vs table size.

Allocation is O(adds in the commit) arithmetic plus one snapshot read
for the watermark; materialization adds one hidden long column to the
files a rewrite touches anyway. Neither should grow with the TABLE —
this script measures append and delete-rewrite wall time on tables of
8/64/512 files, row tracking on vs off, to pin that the overhead is
flat (commit-floor noise) rather than O(table).

Usage: python scripts/row_tracking_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from delta_rs_spark import DeltaTable, write_deltalake  # noqa: E402

ROOT = f"/tmp/rt_scale_{os.getpid()}"


def build(spark, n_files: int, rt: bool) -> str:
    path = os.path.join(ROOT, f"t{n_files}_{int(rt)}")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(n_files * 200).selectExpr("id", "id * 2 AS v").repartition(1)
    cfg = {"delta.enableRowTracking": "true"} if rt else None
    write_deltalake(path, df, configuration=cfg, max_records_per_file=200)
    return path


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("rt-scale")
        .getOrCreate()
    )
    print("| files | append s (off) | append s (on) | delete s (off) | delete s (on) |")
    print("|---|---|---|---|---|")
    for n_files in (8, 64, 512):
        row = [str(n_files)]
        deltas = {}
        for rt in (False, True):
            path = build(spark, n_files, rt)
            extra = spark.range(100).selectExpr(
                "id + 10000000 AS id", "id AS v"
            )
            t0 = time.time()
            write_deltalake(path, extra, mode="append")
            deltas[("append", rt)] = time.time() - t0
            dt = DeltaTable(path, spark=spark)
            t0 = time.time()
            # touches ~2 files regardless of table size
            dt.delete("id >= 10000000")
            deltas[("delete", rt)] = time.time() - t0
            if rt:
                ids = dt_ids = None  # sanity: ids unique post-lifecycle
                dt = DeltaTable(path, spark=spark)
                rows = dt.to_df_with_row_ids().select("_row_id").collect()
                vals = [r["_row_id"] for r in rows]
                assert len(set(vals)) == len(vals), "dup row ids"
        print(
            f"| {n_files} | {deltas[('append', False)]:.2f} | "
            f"{deltas[('append', True)]:.2f} | {deltas[('delete', False)]:.2f} | "
            f"{deltas[('delete', True)]:.2f} |",
            flush=True,
        )
    shutil.rmtree(ROOT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
