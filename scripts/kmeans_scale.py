"""kmeans cost vs corpus size.

Unions the sf0.1 embeddings table k times (vec_ids shifted per copy) and
times similarity.kmeans(k=8, n_iter=2) at each size. Expected shape:
assignment is a per-batch matmul (linear map pass), the centroid update
a partial-agg mean whose output is k*dim rows regardless of input — so
wall time should track the scan, not super-linearly.

Usage: python scripts/kmeans_scale.py [k ...]   (default 1 4 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.functions import similarity as S
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("kmeans_scale")
    base = load_table(spark, SF_DIR, "embeddings")
    n0 = base.count()
    out = []
    for k in ks:
        df = base
        for i in range(1, k):
            df = df.union(
                base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
            )
        df = df.repartition(32).cache()
        df.count()  # materialize outside the timed region
        best = None
        for _ in range(2):
            t0 = time.time()
            assigned, _c = S.kmeans(df, k=8, n_iter=2)
            assigned.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None or el < best else best
        df.unpersist()
        row = {"k": k, "n_vectors": n0 * k, "kmeans_secs": round(best, 2)}
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"kmeans_scale": out}))
    spark.stop()


if __name__ == "__main__":
    main()
