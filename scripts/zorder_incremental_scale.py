"""Incremental Z-ORDER scale evidence: maintenance cost must track the
INCREMENT, not the table.

Builds a clustered base table at growing size (k salted copies of the
sf lineitem subset), appends a FIXED-size increment, then times
(a) z_order(incremental=True)  — should be ~flat in base size
(b) z_order() full rewrite     — grows with base size
and verifies the incremental run rewrote only the increment's files.

Usage: python scripts/zorder_incremental_scale.py [k1 k2 ...]
Prints a markdown table (paste into COVERAGE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/delta_rs_spark_scale/zorder_incr"


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = get_spark("zorder_incr_scale")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    inc = li.filter("l_orderkey % 16 = 0")  # fixed-size increment
    rows = []
    for k in ks:
        base = li
        for i in range(1, k):
            base = base.unionByName(
                li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10**9))
            )
        path = f"{ROOT}/k{k}"
        shutil.rmtree(path, ignore_errors=True)
        write_deltalake(path, base.repartition(4 * k))
        dt = DeltaTable(path, spark=spark)
        n_base_rows = dt.count()
        dt.optimize.z_order(["l_orderkey", "l_partkey"])  # seed cube
        dt.refresh()
        cube1 = set(dt.files())
        write_deltalake(path, inc.repartition(2), mode="append")
        dt.refresh()

        t0 = time.time()
        m_inc = dt.optimize.z_order(["l_orderkey", "l_partkey"], incremental=True)
        t_inc = time.time() - t0
        dt.refresh()
        assert cube1 <= set(dt.files()), "stable cube was rewritten"
        assert m_inc["numFilesRemoved"] == 2

        t0 = time.time()
        m_full = dt.optimize.z_order(["l_orderkey", "l_partkey"])
        t_full = time.time() - t0
        rows.append(
            (k, n_base_rows, m_inc["numFilesRemoved"],
             m_inc["numFilesSkippedAlreadyClustered"], t_inc,
             m_full["numFilesRemoved"], t_full)
        )
        print(
            f"k={k}: base_rows={n_base_rows} inc: removed={rows[-1][2]} "
            f"skipped={rows[-1][3]} {t_inc:.2f}s | full: removed={rows[-1][5]} {t_full:.2f}s",
            flush=True,
        )

    print("\n| k | base rows | incr files rewritten | stable files skipped | incr s | full files rewritten | full s |")
    print("|---|---|---|---|---|---|---|")
    for k, nb, fr, sk, ti, ff, tf in rows:
        print(f"| {k} | {nb:,} | {fr} | {sk} | {ti:.2f} | {ff} | {tf:.2f} |")
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
