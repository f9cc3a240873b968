"""Scaling curves for the r06 retrieval/selection/batching operators.

Same salted-copy corpus construction as newops_scale.py (per-copy token
rename keeps per-copy term statistics constant, token spaces disjoint).
Times:

  - bm25: bm25_topk with a FIXED 4-query head-term query set while the
    corpus grows k-fold — expect ~linear in corpus (the postings build
    dominates; scoring touches only query-term postings)
  - dsir: importance_resampling (top-128 vocab, keep 0.5) — expect
    ~linear (two corpus-keyed aggregations + one global window)
  - buckets: length_bucket_batches — expect ~linear, cheapest (one
    window shuffle over integer lengths)

Prints a markdown table (paste into COVERAGE.md).

Usage: python scripts/retrieval_scale.py [k ...]   (default 1 2 4 8 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.functions.packing import length_bucket_batches
from delta_rs_spark.functions.retrieval import bm25_topk, head_term_queries
from delta_rs_spark.functions.sampling import importance_resampling
from delta_rs_spark.functions.text import token_count
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_corpus(spark, k: int):
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "source",
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


def bm25(docs):
    return bm25_topk(docs, head_term_queries(docs, n_queries=4, n_terms=6), k=10)


def dsir(docs):
    return importance_resampling(docs, F.col("source") == "src0", vocab_size=128)


def buckets(docs):
    lens = docs.select("doc_id", token_count("text").cast("long").alias("n_tokens"))
    return length_bucket_batches(lens, bucket_width=32, batch_size=8)


def budget(docs):
    from delta_rs_spark.functions.sampling import token_budget_cap

    return token_budget_cap(docs, {"src0": 5000, "src1": 3000}, default_budget=2000)


def epoch(docs):
    from delta_rs_spark.functions.sampling import epoch_permutation

    return epoch_permutation(docs, n_shards=16)


def kl(docs):
    from delta_rs_spark.functions.text import source_divergence

    return source_divergence(docs, vocab_size=128)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    spark = get_spark("retrieval-scale")

    ops = {
        "bm25": bm25,
        "dsir": dsir,
        "buckets": buckets,
        "budget": budget,
        "epoch": epoch,
        "kl": kl,
    }
    warm = scaled_corpus(spark, 1).localCheckpoint()
    for op in ops.values():
        op(warm).write.format("noop").mode("overwrite").save()
    warm.unpersist()

    rows = []
    for k in ks:
        docs = scaled_corpus(spark, k).localCheckpoint()
        n_docs = docs.count()
        rec = {"k": k, "n_docs": n_docs}
        for name, op in ops.items():
            rec[name] = timed(lambda: op(docs))
            spark.catalog.clearCache()
        docs.unpersist()
        rows.append(rec)
        print(f"done k={k}: {rec}", file=sys.stderr)

    print("| k | docs | " + " | ".join(f"{n} s (s/1k)" for n in ops) + " |")
    print("|---" * (2 + len(ops)) + "|")
    for r in rows:
        cells = [str(r["k"]), f"{r['n_docs']:,}"]
        for n in ops:
            cells.append(f"{r[n]:.2f} ({1000 * r[n] / r['n_docs']:.3f})")
        print("| " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
