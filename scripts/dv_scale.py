"""DV-vs-rewrite mutation cost measurement.

Builds two identical Delta tables from sf0.1 lineitem (k copies, order
keys shifted per copy) — one with delta.enableDeletionVectors=true —
then times the SAME small predicate DELETE and UPDATE on each and
reports wall time plus bytes written to the table directory. The DV
path's write cost should stay ~flat as the table grows (O(rows
deleted)); the rewrite path's grows with the touched-file volume.

Usage: python scripts/dv_scale.py [k ...]   (default 1 2 4)
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
WORK = "/tmp/dvscale"
SHIFT = 1_000_000_000
# a "small" delete: one order's lines per million order keys — the
# surgical-mutation shape DVs exist for
DEL_PRED = "l_orderkey % 1000 = 7 AND l_linenumber = 1"
UPD_PRED = "l_orderkey % 1000 = 11 AND l_linenumber = 1"


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        if "_delta_log" in root:
            continue
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def build(spark, k: int, dv: bool) -> str:
    path = os.path.join(WORK, f"k{k}_{'dv' if dv else 'rw'}")
    shutil.rmtree(path, ignore_errors=True)
    li = load_table(spark, SF_DIR, "lineitem")
    df = li
    for i in range(1, k):
        df = df.union(li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT)))
    cfg = {"delta.enableDeletionVectors": "true"} if dv else {}
    write_deltalake(path, df.repartition(8 * k), configuration=cfg)
    return path


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    spark = get_spark("dv-scale")
    rows = []
    for k in ks:
        rec = {"k": k}
        for dv in (False, True):
            path = build(spark, k, dv)
            t = DeltaTable(path, spark=spark)
            rec.setdefault("rows", t.count())
            before = dir_bytes(path)
            t0 = time.time()
            m = t.delete(DEL_PRED)
            rec[f"{'dv' if dv else 'rw'}_del_s"] = round(time.time() - t0, 2)
            rec[f"{'dv' if dv else 'rw'}_del_rows"] = m["num_deleted_rows"]
            t.refresh()
            t0 = time.time()
            t.update({"l_quantity": "l_quantity + 1"}, predicate=UPD_PRED)
            rec[f"{'dv' if dv else 'rw'}_upd_s"] = round(time.time() - t0, 2)
            rec[f"{'dv' if dv else 'rw'}_mb_written"] = round(
                (dir_bytes(path) - before) / 1e6, 2
            )
        rows.append(rec)
        print(f"done {rec}", file=sys.stderr)

    print("| k | rows | rewrite del s | DV del s | rewrite upd s | DV upd s | rewrite MB written | DV MB written |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['k']} | {r['rows']:,} | {r['rw_del_s']} | {r['dv_del_s']} "
            f"| {r['rw_upd_s']} | {r['dv_upd_s']} "
            f"| {r['rw_mb_written']} | {r['dv_mb_written']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
