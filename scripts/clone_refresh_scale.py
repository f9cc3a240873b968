"""r10 clone-refresh scale evidence.

Shallow CLONE and its replace=True REFRESH must both be O(metadata):
wall time tracks the source's FILE COUNT (log actions written), never
its row count. Curve: fixed file count with rows growing 8x must stay
flat; growing file count at fixed rows must grow ~linearly in files.
Also reports refresh correctness (refreshed clone count == source) and
the zero-copy invariant (no parquet under the clone root).

Usage: python scripts/clone_refresh_scale.py
Prints a markdown table (paste into COVERAGE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.session import get_spark

ROOT = "/tmp/delta_rs_spark_scale/clone_refresh"


def _parquet_under(root: str) -> int:
    n = 0
    for r, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        n += sum(f.endswith(".parquet") for f in files)
    return n


def main() -> None:
    from delta_rs_spark import DeltaTable, clone_table, write_deltalake

    spark = get_spark("clone-refresh-scale")
    shutil.rmtree(ROOT, ignore_errors=True)

    print("| rows | files | clone s | mutate | refresh s | zero-copy |")
    print("|---|---|---|---|---|---|")
    # leg A: rows grow 8x at ~fixed file count -> walls must stay flat
    # leg B: files grow 8x at fixed rows -> walls may grow with files
    cases = [(100_000, 8), (800_000, 8), (100_000, 16), (100_000, 64)]
    for i, (rows, files) in enumerate(cases):
        src = f"{ROOT}/src{i}"
        dst = f"{ROOT}/dst{i}"
        write_deltalake(
            src,
            spark.range(rows)
            .select(
                F.col("id"),
                (F.col("id") % 97).alias("k"),
                (F.col("id") * 3).alias("v"),
            )
            .repartition(files),
        )
        t0 = time.time()
        clone_table(src, dst)
        t_clone = time.time() - t0

        # source moves on: delete + append (rewrites a subset of files)
        s = DeltaTable(src, spark=spark)
        s.delete("k = 13")
        write_deltalake(
            src,
            spark.range(rows, rows + 1000).select(
                F.col("id"), (F.col("id") % 97).alias("k"), (F.col("id") * 3).alias("v")
            ),
            mode="append",
        )

        t0 = time.time()
        clone_table(src, dst, replace=True)
        t_refresh = time.time() - t0

        c = DeltaTable(dst, spark=spark)
        s.refresh()
        assert c.count() == s.count(), (c.count(), s.count())
        zero = _parquet_under(dst) == 0
        print(
            f"| {rows} | {files} | {t_clone:.2f} | del+app | "
            f"{t_refresh:.2f} | {zero} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
