"""Z-order file-skipping effectiveness measurement (scale evidence).

Writes the sf lineitem table as Delta in N unclustered files, runs a
2-column box predicate through the engine's own stats pruning
(plans/skipping.prune_files via DeltaTable scan), then OPTIMIZE
Z-ORDER on the two columns and prunes again. The point of z-order is
exactly this number: a linear sort clusters ONE column; the Morton
interleave bounds BOTH columns per file, so a 2-D box prunes most
files. Also times the pruned scans.

Usage: python scripts/zorder_scale.py [n_files]   (default 64)
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
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/delta_rs_spark_scale/zorder"

# a ~2% x ~2% box on two independent keys
PRED = "l_orderkey >= 100000 AND l_orderkey < 112000 AND l_partkey >= 1000 AND l_partkey < 1400"


def measure(dt, spark) -> tuple[int, float, int]:
    files = dt.files()
    pruned = dt.to_df(predicate=PRED)
    t0 = time.time()
    n_rows = pruned.count()
    wall = time.time() - t0
    # count candidate files through the same pruning path the scan used
    from delta_rs_spark.plans.skipping import (
        col_types_from_schema_json,
        prune_files,
    )
    import json

    snap = dt._snapshot
    cand = prune_files(
        list(snap.files.values()),
        PRED,
        snap.partition_columns,
        col_types_from_schema_json(json.loads(snap.schema_string)),
        None,
    )
    return len(cand), wall, n_rows


def main() -> None:
    from delta_rs_spark import DeltaTable, write_deltalake

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("zorder-scale")
    shutil.rmtree(ROOT, ignore_errors=True)
    path = f"{ROOT}/li"

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    # unclustered: hash-shuffled into n_files files, every file spans
    # the whole key range -> stats pruning can drop almost nothing
    write_deltalake(path, li.repartition(n_files))
    dt = DeltaTable(path, spark=spark)
    total = len(dt.files())
    dt.to_df(predicate=PRED).count()  # warm
    pre_files, pre_wall, n_rows = measure(dt, spark)

    # keep the file COUNT comparable: target size = current mean file
    # size, so the measurement isolates clustering, not compaction
    mean_size = sum(a.size for a in dt._snapshot.files.values()) // max(total, 1)
    t0 = time.time()
    dt.optimize.z_order(["l_orderkey", "l_partkey"], target_size=mean_size)
    zo_wall = time.time() - t0
    dt.refresh()
    post_total = len(dt.files())
    dt.to_df(predicate=PRED).count()  # warm
    post_files, post_wall, n_rows2 = measure(dt, spark)
    assert n_rows == n_rows2, (n_rows, n_rows2)

    print(f"predicate rows = {n_rows}; z-order wall = {zo_wall:.1f}s", file=sys.stderr)
    print("| layout | files total | files after stats prune | scan s |")
    print("|---|---|---|---|")
    print(f"| unclustered ({n_files} files) | {total} | {pre_files} | {pre_wall:.2f} |")
    print(f"| z-ordered (orderkey, partkey) | {post_total} | {post_files} | {post_wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
