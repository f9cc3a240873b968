"""r11 IVF-sync scale evidence (VERDICT r10 next-round #1).

``sync_ivf_index`` must price index maintenance by the CHANGE BATCH,
never the corpus: at a FIXED churn size, sync wall time must stay ~flat
as the corpus grows 16x, while the O(corpus) alternative (full
``build_ivf_index`` rebuild) grows with the corpus. Correctness leg:
after each sync the index row count equals the source's, and a synced
index equals a frozen-centroid rebuild (spot-assert via counts per
list).

Usage: python scripts/ivf_sync_scale.py [rows ...] (default 20k 80k 320k)
Prints a markdown table (paste into COVERAGE.md).
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.session import get_spark

ROOT = "/tmp/delta_rs_spark_scale/ivf_sync"
DIM = 32
CHURN = 1_000  # fixed change-batch size across every corpus scale


def main() -> None:
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.functions.similarity import build_ivf_index
    from delta_rs_spark.operators.index_sync import (
        ivf_index_balance,
        sync_ivf_index,
    )

    sizes = [int(a) for a in sys.argv[1:]] or [
        80_000,
        320_000,
        1_280_000,
        5_120_000,
    ]
    spark = get_spark("ivf-sync-scale")
    shutil.rmtree(ROOT, ignore_errors=True)

    print("| corpus rows | init s | churn | sync s | rows copied | rebuild s | sync/rebuild | rows ok |")
    print("|---|---|---|---|---|---|---|---|")
    for i, n in enumerate(sizes):
        src, idx = f"{ROOT}/src{i}", f"{ROOT}/idx{i}"
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.cos(F.col("vec_id") * 0.001 + d * 0.01),
        )
        emb = (
            spark.range(n)
            .withColumnRenamed("id", "vec_id")
            .withColumn("embedding", vec)
        )
        write_deltalake(
            src, emb, configuration={"delta.enableChangeDataFeed": "true"}
        )
        t0 = time.time()
        sync_ivf_index(spark, src, idx, n_lists=16)
        init_s = time.time() - t0

        # fixed-size churn: CHURN/2 re-embeds + CHURN/2 appends
        dt = DeltaTable(src, spark=spark)
        dt.update(
            {"embedding": "reverse(embedding)"},
            predicate=f"vec_id < {CHURN // 2}",
        )
        write_deltalake(
            src,
            emb.filter(f"vec_id < {CHURN // 2}").select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                F.reverse("embedding").alias("embedding"),
            ),
            mode="append",
        )
        t0 = time.time()
        r = sync_ivf_index(spark, src, idx)
        sync_s = time.time() - t0

        # the O(corpus) alternative: full rebuild at the same state
        t0 = time.time()
        build_ivf_index(
            DeltaTable(src, spark=spark).to_df(),
            f"{ROOT}/rebuild{i}",
            n_lists=16,
        )
        rebuild_s = time.time() - t0

        n_idx = DeltaTable(idx, spark=spark).to_df().count()
        n_src = DeltaTable(src, spark=spark).to_df().count()
        bal = ivf_index_balance(idx)
        copied = r["metrics"]["num_target_rows_copied"]
        print(
            f"| {n} | {init_s:.2f} | {r['n_change_rows']} | {sync_s:.2f} "
            f"| {copied} | {rebuild_s:.2f} "
            f"| {sync_s / rebuild_s:.2f}x "
            f"| {'yes' if n_idx == n_src and bal['n_rows'] == n_src else 'NO'} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
