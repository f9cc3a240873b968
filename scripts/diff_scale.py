"""table_diff O(churn) evidence: diff cost vs fraction of table mutated.

Fixed-size partitioned table (sf0.1 lineitem subset, partitioned by
l_returnflag+bucket so churn is file-bounded); per churn fraction p:
UPDATE touching ~p of the partitions, then table_diff(v_i, v_i+1).
Reported per point:

  - churned files old/new vs total files (the pruning: files whose
    (path, DV) is unchanged are never read)
  - diff wall seconds (min-of-2; floor-bound at this scale — the file
    counts are the scale evidence, wall shows it doesn't EXCEED churn)

An O(table) diff would scan every file at every p; table_diff's scan
set must track p.

Usage: python scripts/diff_scale.py [p_percent ...]  (default 1 5 25 100)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.log.snapshot import load_snapshot
from delta_rs_spark.operators.diff import churned_files, table_diff
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/delta_rs_spark_scale/diff"
N_BUCKETS = 32


def main() -> None:
    ps = [int(a) for a in sys.argv[1:]] or [1, 5, 25, 100]
    spark = get_spark("diff-scale")
    shutil.rmtree(ROOT, ignore_errors=True)

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    # the synthetic lineitem is NOT (orderkey, linenumber)-unique; stamp a
    # surrogate id at write time (stable once the table is written)
    base = li.withColumn("rid", F.monotonically_increasing_id()).withColumn(
        "bucket", F.pmod(F.col("l_orderkey"), F.lit(N_BUCKETS))
    )
    write_deltalake(ROOT, base, partition_by=["bucket"])
    dt = DeltaTable(ROOT, spark=spark)
    n_rows = dt.to_df().count()

    # warm-up diff (JIT + first log replay)
    dt.update({"l_quantity": "l_quantity + 1"}, predicate="bucket = 0 AND l_linenumber = 1")
    dt.update_incremental()
    table_diff(dt, ["rid"], 0, 1).write.format(
        "noop"
    ).mode("overwrite").save()

    rows = []
    v = dt.version()
    for p in ps:
        n_b = max(1, round(N_BUCKETS * p / 100))
        dt.update(
            {"l_quantity": "l_quantity + 10"},
            predicate=f"bucket < {n_b} AND l_linenumber = 1",
        )
        dt.update_incremental()
        v2 = dt.version()
        old_c, new_c = churned_files(load_snapshot(ROOT, v), load_snapshot(ROOT, v2))
        total = len(load_snapshot(ROOT, v2).files)
        best = None
        n_changed = 0
        for _ in range(2):
            t0 = time.time()
            n_changed = table_diff(
                dt, ["rid"], v, v2
            ).count()
            dtm = time.time() - t0
            best = dtm if best is None else min(best, dtm)
        rows.append(
            {
                "p": p,
                "files_old": len(old_c),
                "files_new": len(new_c),
                "files_total": total,
                "changed_rows": n_changed,
                "sec": round(best, 2),
            }
        )
        print(f"done p={p}%: {rows[-1]}", file=sys.stderr)
        v = v2

    print(f"table: {n_rows} rows, {N_BUCKETS} partitions")
    print("| churn % | churned files (old/new of total) | changed rows | diff s |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['p']} | {r['files_old']}/{r['files_new']} of {r['files_total']} "
            f"| {r['changed_rows']} | {r['sec']:.2f} |"
        )


if __name__ == "__main__":
    main()
