"""Distributed sparse retrieval (BM25) over the document corpus.

The training-data-pipeline uses for this are retrieval-augmented
dataset construction (find corpus passages for a query set), dedup
triage (query = a suspect doc's head), and benchmark decontamination
at ranking granularity — all of which need exactly one corpus-wide
inverted-index pass, never a per-query rescan.

Determinism contract (the repo-wide oracle discipline): the only
transcendental (ln in IDF) is snapped to a 1e-6 grid per TERM, after
which every per-(query,doc,term) contribution is a fixed-association
chain of IEEE basic ops on identical inputs — bit-identical across
engines — quantized to BIGINT on a 1e9 grid so the per-doc sum is an
order-independent integer aggregation. Ranking uses (score_q DESC,
doc_id ASC); the reported double is derived from score_q, never summed
floats.

Reference parity note: delta-rs itself has no retrieval operator; this
is part of the LLM-pipeline extension plane (like dedup.py /
similarity.py). The scoring formula is standard Robertson/Okapi BM25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from delta_rs_spark.functions.text import tokens


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` corpus documents per query by BM25.

    ``queries`` is a small (query_id, term) frame — term-granular so
    callers control query analysis; duplicates are deduped (BM25 query
    term frequency is binarized here, the common web-scale variant).

    Scale shape: ONE postings build (explode + groupBy(doc, term) with
    map-side combine; doc length rides the explode, no second pass),
    a |vocabulary|-sized document-frequency table, and the query frame
    broadcast into the postings scan — the corpus is read once no
    matter how many queries. Scoring shuffles only rows whose term
    appears in some query (the broadcast join prunes the rest at scan),
    then one groupBy(query, doc) integer sum + one per-query top-k
    window. Corpus-global state = two scalars (N, avgdl) and the df
    table — all vocabulary-sized, nothing row-scaled crosses the
    driver.
    """
    q = queries.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("term").cast("string").alias("term"),
    ).distinct()

    postings = (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens(text_col)).alias("dl"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )

    # Corpus scalars: N docs, average doc length. Two numbers to the
    # driver (same contract as tfidf_top_terms' n_docs); avgdl is the
    # IEEE division of two exact integers, reproduced verbatim in SQL.
    n_docs, sum_dl = corpus.select(
        F.count(F.lit(1)), F.sum(F.size(tokens(text_col)))
    ).first()
    if not n_docs:  # empty corpus: sum_dl is NULL and avgdl undefined
        id_t = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"query_id long, rank int, doc_id {id_t}, score double"
        )
    avgdl = float(sum_dl) / float(n_docs)

    # Document frequency per term, restricted to query terms (broadcast
    # join BEFORE the df aggregation would undercount df — df is a
    # corpus-global statistic — so df aggregates first, then the tiny
    # query frame prunes it down to query-vocabulary size so the idf
    # table itself is broadcastable regardless of corpus vocabulary).
    dfreq = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(q.select("term").distinct()), "term")
    )

    # IDF snapped to the 1e-6 grid: the one transcendental in the
    # pipeline; everything downstream is basic-op deterministic.
    idf_q = (
        F.round(
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * F.lit(1e6)
        )
        / F.lit(1e6)
    ).alias("idf")

    scored = (
        postings.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq.select("term", idf_q)), "term")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("idf")
                * (
                    (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl))
                        )
                    )
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("contrib_q"),
        )
    )

    w = W.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("doc_id").asc()
    )
    return (
        scored.groupBy("query_id", "doc_id")
        .agg(F.sum("contrib_q").alias("score_q"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.round(F.col("score_q").cast("double") / F.lit(1e9), 6).alias("score"),
        )
    )


def head_term_queries(
    corpus: DataFrame,
    n_queries: int = 4,
    n_terms: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic query set for tests/gates: the ``n_queries``
    lowest-id documents contribute their first ``n_terms`` tokens as
    query terms (query_id = the source doc's id). Pure DataFrame ops so
    the oracle replays it; real callers pass their own query frame."""
    return (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_queries)
        .select(
            F.col(id_col).cast("long").alias("query_id"),
            F.explode(F.slice(tokens(text_col), 1, n_terms)).alias("term"),
        )
        .distinct()
    )
