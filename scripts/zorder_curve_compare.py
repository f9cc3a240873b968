"""Morton vs Hilbert z-order: file-skipping head-to-head.

Same construction as zorder_scale.py (sf lineitem, N hash-shuffled
files, mean-size-preserving OPTIMIZE so the comparison isolates
clustering), but each curve clusters its own copy and a GRID of box
predicates is pruned against both (one box is an anecdote; the mean
pruned fraction over a predicate sweep is the measurement). Hilbert's
unit-step locality gives each equal-size file cut a tighter min/max
box than Morton's diagonal jumps, so it should prune the same or
better at identical write cost.

Usage: python scripts/zorder_curve_compare.py [n_files] (default 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/delta_rs_spark_scale/zorder_cmp"


def boxes(ok_lo, ok_hi, pk_lo, pk_hi, frac=0.02, n=4):
    """n x n grid of ~frac x frac boxes across both key ranges."""
    ow = int((ok_hi - ok_lo) * frac)
    pw = int((pk_hi - pk_lo) * frac)
    out = []
    for i in range(n):
        for j in range(n):
            o0 = ok_lo + (ok_hi - ok_lo) * (i * 2 + 1) // (n * 2 + 1)
            p0 = pk_lo + (pk_hi - pk_lo) * (j * 2 + 1) // (n * 2 + 1)
            out.append(
                f"l_orderkey >= {o0} AND l_orderkey < {o0 + ow} AND "
                f"l_partkey >= {p0} AND l_partkey < {p0 + pw}"
            )
    return out


def pruned_counts(dt, preds):
    from delta_rs_spark.plans.skipping import col_types_from_schema_json, prune_files

    snap = dt._snapshot
    types = col_types_from_schema_json(json.loads(snap.schema_string))
    adds = list(snap.files.values())
    return [len(prune_files(adds, p, snap.partition_columns, types, None)) for p in preds]


def main() -> None:
    from delta_rs_spark import DeltaTable, write_deltalake

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("zorder-cmp")
    shutil.rmtree(ROOT, ignore_errors=True)

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    import pyspark.sql.functions as F

    # bounds for the predicate grid
    b = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]
    preds = boxes(b[0], b[1], b[2], b[3])

    # warm-up: a small z_order pays the JIT / pandas-udf / writer
    # startup once so neither curve's measured wall absorbs it (the
    # first pass measured 48s vs 2.5s for IDENTICAL work)
    wpath = f"{ROOT}/warm"
    write_deltalake(wpath, li.limit(10_000).repartition(4))
    wdt = DeltaTable(wpath, spark=spark)
    wdt.optimize.z_order(["l_orderkey", "l_partkey"], curve="morton")
    wdt.refresh()
    wdt.optimize.z_order(["l_orderkey", "l_partkey"], curve="hilbert")

    results = {}
    for curve in ("morton", "hilbert"):
        path = f"{ROOT}/{curve}"
        write_deltalake(path, li.repartition(n_files))
        dt = DeltaTable(path, spark=spark)
        total = len(dt.files())
        pre = pruned_counts(dt, preds)
        mean_size = sum(a.size for a in dt._snapshot.files.values()) // max(total, 1)
        t0 = time.time()
        dt.optimize.z_order(
            ["l_orderkey", "l_partkey"], target_size=mean_size, curve=curve
        )
        wall = time.time() - t0
        dt.refresh()
        post = pruned_counts(dt, preds)
        results[curve] = {
            "total": len(dt.files()),
            "pre_mean": sum(pre) / len(pre),
            "post_mean": sum(post) / len(post),
            "post_max": max(post),
            "wall": wall,
        }
        print(f"done {curve}: {results[curve]}", file=sys.stderr)

    print(f"{len(preds)} box predicates (~2% x ~2%), {n_files} input files")
    print("| curve | files | mean files pruned-to (pre) | mean (post) | worst (post) | optimize s |")
    print("|---|---|---|---|---|---|")
    for c, r in results.items():
        print(
            f"| {c} | {r['total']} | {r['pre_mean']:.1f} | {r['post_mean']:.2f} "
            f"| {r['post_max']} | {r['wall']:.1f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
