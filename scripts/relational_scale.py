"""Relational-plane scaling measurement (companion to scaling_curve.py).

Materializes k-scaled TPC-H-ish fact tables from sf0.1 — lineitem and
orders unioned k times with order keys shifted per copy, dimensions left
fixed (fact growth per entity, the realistic 100 TB shape: customers
don't multiply with ingest volume, their order counts do) — then times
representative heavy queries through the normal query functions.

Prints a markdown table (sec and sec per million lineitem rows); a flat
s/M column = linear scan/shuffle scaling.

Usage: python scripts/relational_scale.py [k ...]   (default 1 2 4 8)
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
WORK = "/tmp/relscale"
SHIFT = 1_000_000_000  # > any base o_orderkey
QUERIES = (
    "q1_pricing_summary",       # pure scan + agg
    "q9_product_type_profit",   # 5-way join
    "q18_large_volume_customers",  # big agg + semi join
    "q21_waiting_suppliers",    # lineitem self-joins + anti join
)


def materialize(spark, k: int) -> str:
    out = os.path.join(WORK, f"k{k}")
    if os.path.exists(out):
        return out
    os.makedirs(out)
    for name in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(
            os.path.join(SF_DIR, f"{name}.parquet"),
            os.path.join(out, f"{name}.parquet"),
        )
    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders")
    li_k = li
    od_k = od
    for i in range(1, k):
        li_k = li_k.union(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT))
        )
        od_k = od_k.union(
            od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * SHIFT))
        )
    li_k.repartition(32).write.parquet(os.path.join(out, "lineitem.parquet"))
    od_k.repartition(8).write.parquet(os.path.join(out, "orders.parquet"))
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = get_spark("relational-scale")
    import delta_rs_spark.queries  # noqa: F401 populate registry
    from delta_rs_spark.queries import registry

    reg = registry()
    rows = []
    for k in ks:
        d = materialize(spark, k)
        n_li = spark.read.parquet(os.path.join(d, "lineitem.parquet")).count()
        rec = {"k": k, "n_li": n_li}
        for q in QUERIES:
            fn = reg[q][0]
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            ts = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            rec[q] = round(min(ts), 2)
        rows.append(rec)
        print(f"done k={k}: {rec}", file=sys.stderr)

    print("| k | lineitem rows | " + " | ".join(f"{q} s | s/M" for q in QUERIES) + " |")
    print("|---" * (2 + 2 * len(QUERIES)) + "|")
    for r in rows:
        cells = [str(r["k"]), f"{r['n_li']:,}"]
        for q in QUERIES:
            cells += [f"{r[q]:.2f}", f"{1e6 * r[q] / r['n_li']:.3f}"]
        print("| " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
