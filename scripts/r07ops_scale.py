"""Scaling-curve measurement for the r07 operators.

Same constant-density salted-copy corpus as the other curves
(newops_scale.py / text_scale.py). Times:

  - gopher  (gopher_quality_report -> noop): shuffle-free codegen
    projection — expect strictly linear wall, flat per-doc
  - diversity (ngram_diversity): one tagged-union (source,kind,gram)
    aggregation — expect ~linear (gram table grows with salt)
  - zipf (zipf_fit, top-256): frequency table + 256-row fit — expect
    near-flat (term groupBy rides map-side combine; fit is constant)
  - hybrid (bm25 + ql + rrf over a FIXED 4-query set): corpus grows,
    query volume doesn't — expect sub-linear (broadcast-pruned
    postings scoring)
  - ingest_replay (3-batch replay_corpus_ingest from an empty index):
    expect linear in corpus with a Delta-commit floor

Usage: python scripts/r07ops_scale.py [k ...]   (default 1 2 4 8)
Prints a markdown table (paste into COVERAGE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.functions.retrieval import (
    bm25_topk,
    head_term_queries,
    ql_topk,
    rrf_fuse,
)
from delta_rs_spark.functions.text import (
    gopher_quality_report,
    ngram_diversity,
    zipf_fit,
)
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/delta_rs_spark_scale/r07ops"


def scaled_corpus(spark, k: int):
    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
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


def hybrid(docs):
    qs = head_term_queries(docs, n_queries=4, n_terms=6)
    return rrf_fuse(
        [bm25_topk(docs, qs, k=20), ql_topk(docs, qs, k=20)], k=60, topk=10
    )


def ingest_replay(docs, tag: str) -> float:
    from delta_rs_spark import DeltaTable
    from delta_rs_spark.functions.dedup import build_fingerprint_index
    from delta_rs_spark.streaming.ingest import replay_corpus_ingest

    root = f"{ROOT}/{tag}"
    shutil.rmtree(root, ignore_errors=True)
    corpus, index = f"{root}/corpus", f"{root}/fp"
    t0 = time.time()
    build_fingerprint_index(docs.limit(0), index)
    replay_corpus_ingest(
        [docs.filter(F.col("doc_id") % 3 == b) for b in (0, 1, 2)],
        corpus,
        index,
        lang="en",
        min_quality=0.5,
        min_tokens=20,
    )
    DeltaTable(corpus).to_df().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = get_spark("r07ops-scale")

    ops = {
        "gopher": gopher_quality_report,
        "diversity": ngram_diversity,
        "zipf": zipf_fit,
        "hybrid": hybrid,
    }
    warm = scaled_corpus(spark, 1).localCheckpoint()
    for op in ops.values():
        op(warm).write.format("noop").mode("overwrite").save()
    ingest_replay(warm, "warm")
    warm.unpersist()

    rows = []
    for k in ks:
        docs = scaled_corpus(spark, k).localCheckpoint()
        n = docs.count()
        rec = {"k": k, "n": n}
        for name, op in ops.items():
            rec[name] = timed(lambda: op(docs))
            spark.catalog.clearCache()
        rec["ingest_replay"] = ingest_replay(docs, f"k{k}")
        docs.unpersist()
        rows.append(rec)
        print(f"done k={k}: {rec}", file=sys.stderr)

    names = [*ops, "ingest_replay"]
    print("| k | docs | " + " | ".join(f"{n} s" for n in names) + " |")
    print("|---" * (2 + len(names)) + "|")
    for r in rows:
        print(
            f"| {r['k']} | {r['n']} | "
            + " | ".join(f"{r[n]:.2f}" for n in names)
            + " |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
