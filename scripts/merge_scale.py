"""MERGE cost vs table size (the heaviest mutation operator).

Builds k-copy Delta tables from sf0.1 lineitem (order keys shifted per
copy) and times the SAME three-clause MERGE against each: an upsert
source touching ~0.1% of orders — half updated, a quarter deleted, plus
fresh keys inserted. Reports wall seconds and M target rows, so
COVERAGE.md can record whether merge cost tracks the TOUCHED volume
(good — the touched-file rewrite shape) or the table volume (bad).

Usage: python scripts/merge_scale.py [k ...]   (default 1 4)
"""

from __future__ import annotations

import json
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
WORK = "/tmp/mergescale"
SHIFT = 1_000_000_000


def build(spark, k: int) -> str:
    path = os.path.join(WORK, f"k{k}")
    shutil.rmtree(path, ignore_errors=True)
    li = load_table(spark, SF_DIR, "lineitem")
    df = li
    for i in range(1, k):
        df = df.union(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT))
        )
    write_deltalake(path, df.repartition(8 * k))
    return path


def source_df(spark, k: int):
    """~0.1% of orders per copy: keys ending in 007 (update half /
    delete rest by quantity parity) plus fresh insert keys."""
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter("l_orderkey % 1000 = 7 AND l_linenumber <= 2")
        # testdata lineitem is not unique on the merge key — the source
        # side must be, or dup-match validation (correctly) rejects it
        .dropDuplicates(["l_orderkey", "l_linenumber"])
    )
    parts = []
    for i in range(k):
        parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT))
        )
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.union(p)
    inserts = li.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit((k + 1) * SHIFT)
    )
    return hits.union(inserts)


def run_merge(spark, path: str, src) -> dict:
    t = DeltaTable(path, spark=spark)
    t0 = time.time()
    m = (
        t.merge(
            src,
            "t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber",
            source_alias="s",
            target_alias="t",
        )
        .when_matched_update(
            {"l_quantity": "s.l_quantity + 1"},
            predicate="s.l_quantity % 2 = 0",
        )
        .when_matched_delete(predicate="s.l_quantity % 2 = 1")
        .when_not_matched_insert_all()
        .execute()
    )
    secs = round(time.time() - t0, 2)
    return {"secs": secs, "metrics": m}


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4]
    spark = get_spark("merge_scale")
    out = []
    for k in ks:
        path = build(spark, k)
        n = DeltaTable(path, spark=spark).count()
        src = source_df(spark, k)
        r = run_merge(spark, path, src)
        row = {
            "k": k,
            "target_m_rows": round(n / 1e6, 2),
            "merge_secs": r["secs"],
            "rows_updated": r["metrics"].get("num_target_rows_updated"),
            "rows_deleted": r["metrics"].get("num_target_rows_deleted"),
            "rows_inserted": r["metrics"].get("num_target_rows_inserted"),
            "files_added": r["metrics"].get("num_target_files_added"),
            "files_removed": r["metrics"].get("num_target_files_removed"),
        }
        out.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"merge_scale": out}))
    spark.stop()


if __name__ == "__main__":
    main()
