"""Incremental-dedup probe cost vs history size.

Builds fingerprint + band indexes over k salted copies of sf0.1
documents (constant dup density, like scaling_curve.py), then times the
SAME fixed 200-doc batch probe against each history size. The claim
under test: probe cost is driven by the batch, not the corpus — the
curves should be ~flat while history grows 8x.

Usage: python scripts/incremental_scale.py [k ...]   (default 1 2 4 8)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.functions import dedup as D
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/incscale"


def scaled_corpus(spark, k: int):
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
    return df.repartition(min(32, max(2, k * 4)))


def timed(fn) -> float:
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = get_spark("incremental-scale")
    batch = (
        load_table(spark, SF_DIR, "documents")
        .select((F.col("doc_id") + 99_000_000).alias("doc_id"), "text")
        .limit(200)
        .localCheckpoint(eager=True)
    )
    rows = []
    for k in ks:
        fp_path = os.path.join(WORK, f"fp{k}")
        band_path = os.path.join(WORK, f"band{k}")
        shutil.rmtree(fp_path, ignore_errors=True)
        shutil.rmtree(band_path, ignore_errors=True)
        hist = scaled_corpus(spark, k).localCheckpoint(eager=True)
        n = hist.count()
        D.build_fingerprint_index(hist, fp_path)
        D.build_band_index(hist, band_path, num_perm=32, bands=8)
        hist.unpersist()
        # warm once, then min of 2 timed probes
        for fn in (
            lambda: D.dedup_against_fingerprint_index(spark, fp_path, batch),
            lambda: D.near_dup_candidates_against_index(spark, band_path, batch),
        ):
            fn().write.format("noop").mode("overwrite").save()
        fp_s = min(
            timed(lambda: D.dedup_against_fingerprint_index(spark, fp_path, batch))
            for _ in range(2)
        )
        band_s = min(
            timed(lambda: D.near_dup_candidates_against_index(spark, band_path, batch))
            for _ in range(2)
        )
        rows.append({"k": k, "n_hist": n, "fp_s": fp_s, "band_s": band_s})
        print(f"done {rows[-1]}", file=sys.stderr)

    print("| k | history docs | fp probe s | band probe s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['k']} | {r['n_hist']:,} | {r['fp_s']} | {r['band_s']} |")
    spark.stop()


if __name__ == "__main__":
    main()
