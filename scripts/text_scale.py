"""Scaling-curve measurement for the r04 text-plane operators.

Same salted-copy corpus construction as scaling_curve.py (token rename
per copy keeps duplicate/boilerplate DENSITY constant while making
cross-copy token spaces disjoint). Times:

  - line_dedup (re-lined corpus, shared-line strip + reassembly)
    — expect ~linear (groupBy norm + join + groupBy doc)
  - corpus_filter_report (composed ingest gate, one fp window shuffle)
    — expect ~linear
  - unigram_logprob (tf table + broadcast vocab) — expect ~linear

Prints a markdown table (paste into COVERAGE.md) with sec and sec/1k
docs.

Usage: python scripts/text_scale.py [k ...]   (default 1 2 4 8 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.functions import text as X
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    spark = get_spark("text-scale")
    reline = lambda d: d.withColumn(
        "text", F.regexp_replace(F.col("text"), r"((\S+ ){7}\S+) ", "$1\n")
    )
    ops = {
        "line_dedup": lambda docs: X.line_dedup(reline(docs)),
        "ingest_gate": lambda docs: X.corpus_filter_report(docs),
        "unigram_lm": lambda docs: X.unigram_logprob(docs),
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
        docs.unpersist()
        rows.append(rec)
        print(f"done k={k}: {rec}", file=sys.stderr)

    print("| k | docs | " + " | ".join(f"{n} s | s/1k" for n in ops) + " |")
    print("|---" * (2 + 2 * len(ops)) + "|")
    for r in rows:
        cells = [str(r["k"]), str(r["n_docs"])]
        for n in ops:
            cells += [f"{r[n]:.2f}", f"{1000 * r[n] / r['n_docs']:.3f}"]
        print("| " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
