"""Scaling-curve measurement for the r06 operators.

Same salted-copy corpus construction as text_scale.py (token rename per
copy keeps duplicate DENSITY constant — within-copy duplicated spans
are preserved, cross-copy token spaces disjoint). Times:

  - span_dedup (strip_duplicate_spans over the doubled corpus: one
    window-fingerprint shuffle + one doc-keyed island merge) — expect
    ~linear in total windows
  - hashed_clf (train_hashed_classifier 2 iters + scoring) — expect
    ~linear (explode + bucket aggregations, model-sized driver traffic)
  - bpe_learn3 (3 BPE merge rounds + vocab) — expect ~FLAT: the work is
    vocabulary-sized, and the salted copies multiply the vocab by k
    while corpus frequencies ride the word table

  - interval_join: events-based (k = multiple of the events table with
    shifted event ids, same time range -> window density constant,
    events per window grows k-fold)

Prints markdown tables (paste into COVERAGE.md).

Usage: python scripts/newops_scale.py [k ...]   (default 1 2 4 8 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark.functions import dedup as D
from delta_rs_spark.functions import text as X
from delta_rs_spark.functions.rangejoin import interval_join
from delta_rs_spark.functions.vocab import bpe_learn, bpe_vocab
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


def scaled_events(spark, k: int):
    base = load_table(spark, SF_DIR, "events").select("event_id", "ts", "value")
    copies = [
        base.select(
            (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
            "ts",
            "value",
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


def span_dedup(docs):
    doubled = docs.union(
        docs.select((F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text")
    )
    return D.strip_duplicate_spans(doubled, window=8)


def hashed_clf(docs):
    sp = X.hashed_ngram_features(docs, n_buckets=64).persist()
    bias, w = X.train_hashed_classifier(
        docs, F.length("text") > 100, n_buckets=64, n_iter=2, features=sp
    )
    out = X.score_hashed_classifier(docs, bias, w, features=sp)
    return out


def bpe3(docs):
    return bpe_vocab(docs, bpe_learn(docs, n_merges=3))


def ij(events):
    sec = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))).cast("long")
    e = events.select(
        "event_id",
        sec.alias("ls"),
        (sec + F.floor(F.greatest(F.col("value"), F.lit(0.0)) * 60).cast("long")).alias("le"),
    )
    bounds = e.agg(
        (F.floor(F.min("ls") / 3600.0) * 3600).cast("long").alias("h0"),
        (F.floor(F.max("ls") / 3600.0) * 3600).cast("long").alias("h1"),
    )
    wins = bounds.select(
        F.explode(F.sequence("h0", "h1", F.lit(3600).cast("long"))).alias("rs")
    ).withColumn("re", F.col("rs") + F.lit(899).cast("long"))
    return (
        interval_join(e, wins, "ls", "le", "rs", "re", bucket_width=3600)
        .groupBy("rs")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    spark = get_spark("newops-scale")

    doc_ops = {"span_dedup": span_dedup, "hashed_clf": hashed_clf, "bpe3": bpe3}
    warm = scaled_corpus(spark, 1).localCheckpoint()
    for op in doc_ops.values():
        op(warm).write.format("noop").mode("overwrite").save()
    warm.unpersist()

    rows = []
    for k in ks:
        docs = scaled_corpus(spark, k).localCheckpoint()
        n_docs = docs.count()
        rec = {"k": k, "n_docs": n_docs}
        for name, op in doc_ops.items():
            rec[name] = timed(lambda: op(docs))
            # the classifier persists its shared feature frame; drop all
            # cached frames between ops so one op's cache never pressures
            # the next measurement's heap
            spark.catalog.clearCache()
        docs.unpersist()
        rows.append(rec)
        print(f"done k={k}: {rec}", file=sys.stderr)

    print("| k | docs | " + " | ".join(f"{n} s | s/1k" for n in doc_ops) + " |")
    print("|---" * (2 + 2 * len(doc_ops)) + "|")
    for r in rows:
        cells = [str(r["k"]), str(r["n_docs"])]
        for n in doc_ops:
            cells += [f"{r[n]:.2f}", f"{1000 * r[n] / r['n_docs']:.3f}"]
        print("| " + " | ".join(cells) + " |")

    erows = []
    ij(scaled_events(spark, 1).localCheckpoint()).write.format("noop").mode(
        "overwrite"
    ).save()
    for k in ks:
        ev = scaled_events(spark, k).localCheckpoint()
        n_ev = ev.count()
        t = timed(lambda: ij(ev))
        ev.unpersist()
        erows.append({"k": k, "n_ev": n_ev, "t": t})
        print(f"done events k={k}: {t}s", file=sys.stderr)
    print("\n| k | events | interval_join s | s/100k events |")
    print("|---|---|---|---|")
    for r in erows:
        print(
            f"| {r['k']} | {r['n_ev']} | {r['t']:.2f} |"
            f" {100_000 * r['t'] / r['n_ev']:.3f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
