"""Hot-fingerprint skew measurement for duplicate_spans (r06 verdict #1).

Builds two corpora with the SAME total window count:

  - uniform: the salted-copy corpus (disjoint token spaces per copy,
    duplicate density constant — the newops_scale.py construction)
  - hot: identical, except 10% of docs have their text replaced by one
    8-token boilerplate phrase repeated to the doc's original token
    count. Every rolling window inside those docs is one of just 8
    cyclic-shift fingerprints, so ~10% of ALL corpus windows collapse
    onto 8 hot keys — the "all rights reserved" shape of a web corpus.

With the r06 window-over-fp implementation the hot corpus serialized
~10% of all windows through single tasks; with the groupBy + join-back
restructure both the count and the keep-first pick partial-aggregate,
so hot/uniform wall should be ~1x (flat).

Usage: python scripts/span_skew_scale.py [k ...]   (default 2 4)
Prints a markdown table (paste into COVERAGE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.functions import dedup as D
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PHRASE = "all rights reserved unauthorized reproduction strictly prohibited notice"


def scaled_corpus(spark, k: int, hot_frac: float):
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", rf"$1_{i}").alias("text"),
        )
        for i in range(k)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.union(c)
    if hot_frac > 0:
        # deterministic pick; replacement preserves the doc's token count
        # so total windows match the uniform corpus
        n_tok = F.size(F.split(F.trim("text"), r"\s+"))
        boiler = F.trim(
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.ceil(n_tok / 8).cast("int")),
                    lambda _: F.lit(PHRASE),
                ),
            )
        )
        is_hot = F.pmod(F.xxhash64("doc_id"), F.lit(100)) < int(hot_frac * 100)
        df = df.withColumn("text", F.when(is_hot, boiler).otherwise(F.col("text")))
    return df.repartition(min(32, max(2, k * 4)))


def timed(df) -> float:
    t0 = time.time()
    D.duplicate_spans(df, window=8).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [2, 4]
    spark = get_spark("span-skew-scale")
    timed(scaled_corpus(spark, 1, 0.0).localCheckpoint())  # warm
    print("| k | docs | uniform s | hot(10%) s | hot/uniform |")
    print("|---|---|---|---|---|")
    for k in ks:
        uni = scaled_corpus(spark, k, 0.0).localCheckpoint()
        hot = scaled_corpus(spark, k, 0.10).localCheckpoint()
        n = uni.count()
        hot.count()
        tu = timed(uni)
        th = timed(hot)
        uni.unpersist()
        hot.unpersist()
        print(f"| {k} | {n} | {tu:.2f} | {th:.2f} | {th / tu:.2f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
