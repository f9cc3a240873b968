"""Index-sync scaling: sync cost vs CHANGE-BATCH size at fixed corpus
(r06 verdict #8 — completes the O(changes) evidence: the probe curves
already show index probes flat in history size; this shows the sync
itself is priced by the change feed, not the corpus).

Builds a CDF-enabled source Delta table from sf documents, initializes
the fingerprint + band indexes, then for each batch size B: UPDATE B
docs in one commit, run both syncs, time them. O(changes) means wall
grows sub-linearly in B (fixed Delta-commit floor + a batch-sized
merge) and per-change cost FALLS; an O(corpus) implementation would be
flat-per-run at corpus cost regardless of B.

Usage: python scripts/index_sync_scale.py [B ...]  (default 100 400 1600 6400)
Prints a markdown table (paste into COVERAGE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/delta_rs_spark_scale/index_sync"


def main() -> None:
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.operators.index_sync import (
        sync_band_index,
        sync_fingerprint_index,
    )

    batches = [int(a) for a in sys.argv[1:]] or [100, 400, 1600, 6400]
    spark = get_spark("index-sync-scale")
    shutil.rmtree(ROOT, ignore_errors=True)
    src = f"{ROOT}/src"
    fp_idx, band_idx = f"{ROOT}/fp", f"{ROOT}/band"

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_corpus = docs.count()
    write_deltalake(
        src, docs, configuration={"delta.enableChangeDataFeed": "true"}
    )
    t0 = time.time()
    sync_fingerprint_index(spark, src, fp_idx)
    init_fp = time.time() - t0
    t0 = time.time()
    sync_band_index(spark, src, band_idx, num_perm=32, bands=8)
    init_band = time.time() - t0
    print(
        f"corpus = {n_corpus} docs; init: fp {init_fp:.2f}s, band {init_band:.2f}s",
        file=sys.stderr,
    )

    print("| batch B | update s | fp sync s (ms/chg) | band sync s (ms/chg) |")
    print("|---|---|---|---|")
    for b in batches:
        dt = DeltaTable(src, spark=spark)
        t0 = time.time()
        # deterministic disjoint-ish victim set of ~B docs
        dt.update(
            {"text": f"concat(text, ' chg{b}')"},
            predicate=f"pmod(doc_id, {max(1, n_corpus // b)}) = 0",
        )
        t_upd = time.time() - t0
        t0 = time.time()
        r1 = sync_fingerprint_index(spark, src, fp_idx)
        t_fp = time.time() - t0
        t0 = time.time()
        r2 = sync_band_index(spark, src, band_idx)
        t_band = time.time() - t0
        n_chg = int(r1["n_change_rows"])
        print(
            f"| {n_chg} | {t_upd:.2f} | {t_fp:.2f} ({1000 * t_fp / max(n_chg, 1):.2f}) "
            f"| {t_band:.2f} ({1000 * t_band / max(n_chg, 1):.2f}) |"
        )
        assert int(r2["n_change_rows"]) >= n_chg  # band rows >= docs changed
    spark.stop()


if __name__ == "__main__":
    main()
