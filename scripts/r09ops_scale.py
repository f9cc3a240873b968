"""r09 ops scale evidence.

1. NO-CDF diff-sync vs CDF sync — cost vs change-batch size B at fixed
   corpus (the retroactive-sync migration path must stay O(churn) like
   the CDF path it replaces): two identical source tables (one with
   CDF, one without), same per-B UPDATE commits, fp sync timed on each.
   O(churn) means both walls grow sub-linearly in B and the diff path
   tracks the CDF path within a constant (the diff adds two snapshot
   loads + a churn-bounded full-outer join; it must NOT track corpus
   size). Also reports the churned-file fraction the diff read.

2. Indexed hybrid dense probe pruning — llm_dense_hybrid_indexed's
   dense half must read only the probed list partitions of the IVF
   index at any corpus size: report files probed / files total from
   the Delta log for the 4-query probe set.

Usage: python scripts/r09ops_scale.py [B ...]   (default 100 400 1600 6400)
Prints markdown tables (paste into COVERAGE.md).
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
ROOT = "/tmp/delta_rs_spark_scale/r09ops"


def main() -> None:
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.log.snapshot import load_snapshot
    from delta_rs_spark.operators.diff import churned_files
    from delta_rs_spark.operators.index_sync import sync_fingerprint_index

    batches = [int(a) for a in sys.argv[1:]] or [100, 400, 1600, 6400]
    spark = get_spark("r09ops-scale")
    shutil.rmtree(ROOT, ignore_errors=True)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_corpus = docs.count()
    legs = {}
    for leg, conf in (
        ("cdf", {"delta.enableChangeDataFeed": "true"}),
        ("diff", None),
    ):
        src, idx = f"{ROOT}/{leg}_src", f"{ROOT}/{leg}_idx"
        write_deltalake(src, docs, configuration=conf)
        sync_fingerprint_index(spark, src, idx)
        legs[leg] = (src, idx)
    print(f"corpus = {n_corpus} docs; legs initialized", file=sys.stderr)

    # throwaway batch: JIT/codegen warm-up must not land in the first row
    for leg, (src, idx) in legs.items():
        DeltaTable(src, spark=spark).update(
            {"text": "concat(text, ' w')"}, predicate="doc_id % 1000 = 17"
        )
        sync_fingerprint_index(spark, src, idx)

    print("\n| B changed | cdf sync s (min2) | diff sync s (min2) | "
          "diff churned files old/new of total | s/1k change (diff) |")
    print("|---|---|---|---|---|")
    for step, b in enumerate(batches):
        row = {}
        churn_note = ""
        for leg, (src, idx) in legs.items():
            dt = DeltaTable(src, spark=spark)
            pre_version = dt.version()
            dt.update(
                {"text": f"concat(text, ' v{step}')"},
                predicate=f"doc_id % {max(1, n_corpus // b)} = 0",
            )
            times = []
            for it in (0, 1):  # min-of-2 (box shows periodic spikes)
                if it == 1:
                    # re-arm: another same-size commit so the second
                    # sample syncs a fresh equal-sized range
                    DeltaTable(src, spark=spark).update(
                        {"text": f"concat(text, ' v{step}b')"},
                        predicate=f"doc_id % {max(1, n_corpus // b)} = 1",
                    )
                t0 = time.time()
                sync_fingerprint_index(spark, src, idx)
                times.append(time.time() - t0)
            row[leg] = min(times)
            if leg == "diff":
                post = DeltaTable(src, spark=spark).version()
                so, sn = load_snapshot(src, pre_version), load_snapshot(src, post)
                oc, nc = churned_files(so, sn)
                churn_note = (
                    f"{len(oc)}/{len(nc)} of {len(sn.files)}"
                )
        per_1k = row["diff"] / max(b, 1) * 1000
        print(
            f"| {b} | {row['cdf']:.2f} | {row['diff']:.2f} | {churn_note} | "
            f"{per_1k:.3f} |"
        )

    # --- partitioned source: the sync's churn PRUNING leg -----------
    # (the B-curve above runs on a 1-file corpus where every commit
    # churns everything; this leg pins that a bucket-scoped mutation
    # leaves the other buckets' files OUT of the diff's scan set)
    psrc, pidx = f"{ROOT}/part_src", f"{ROOT}/part_idx"
    docs_b = docs.withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(16)))
    write_deltalake(psrc, docs_b, partition_by=["bucket"])
    sync_fingerprint_index(spark, psrc, pidx)
    dt = DeltaTable(psrc, spark=spark)
    pre = dt.version()
    dt.update(
        {"text": "concat(text, ' px')"}, predicate="bucket = 7 AND doc_id % 48 = 7"
    )
    t0 = time.time()
    sync_fingerprint_index(spark, psrc, pidx)
    wall = time.time() - t0
    so = load_snapshot(psrc, pre)
    sn = load_snapshot(psrc)
    oc, nc = churned_files(so, sn)
    bad = [
        a for a in oc + nc if a.partition_values.get("bucket") != "7"
    ]
    print(
        f"\npartitioned no-CDF sync: one-bucket mutation churned "
        f"{len(oc)}/{len(nc)} files of {len(sn.files)} total; "
        f"out-of-bucket churned files = {len(bad)} (must be 0); "
        f"sync {wall:.2f}s"
    )

    # --- indexed hybrid probe pruning -------------------------------
    from delta_rs_spark.functions.similarity import (
        build_ivf_index,
        ivf_topk_indexed_multi,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = f"{ROOT}/ivf"
    build_ivf_index(emb, idx, n_lists=16)
    t = DeltaTable(idx, spark=spark)
    total_files = len(t.files())
    qs = emb.filter(F.col("vec_id") < 4)
    out = ivf_topk_indexed_multi(spark, idx, qs, k=20, n_probe=4, q_id_col="vec_id")
    n = out.count()
    # partition pruning evidence straight from the log: files under the
    # probed list partitions vs all index files
    probed_lists = {
        r.list
        for r in out.join(
            t.to_df(columns=["id", "list"]), out.doc_id == F.col("id")
        ).select("list").distinct().collect()
    }
    probed_files = len(
        [a for a in t.files(partition_filters=[("list", "in", [str(i) for i in sorted(probed_lists)])])]
    ) if probed_lists else 0
    print(
        f"\nindexed hybrid dense probe: {n} ranked rows for 4 queries; "
        f"candidate partitions {sorted(probed_lists)} -> "
        f"{probed_files}/{total_files} index files readable by the scan"
    )
    spark.stop()


if __name__ == "__main__":
    main()
