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


def build_postings(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The shared inverted-index frame (doc_id, term, tf, dl) both
    rankers score from — build it once (and optionally persist /
    localCheckpoint it) when running BM25 and query-likelihood over the
    same corpus, e.g. for hybrid fusion: the corpus is tokenized and
    shuffled ONCE instead of once per ranker."""
    return (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens(text_col)).alias("dl"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
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

    if postings is None:
        # the postings frame feeds two consumers (document frequency +
        # scoring) and the scalar pass below; pin it so the corpus is
        # tokenized and shuffled ONCE per call, not once per consumer
        # (r12; hybrid callers already pass a pinned frame in)
        postings = build_postings(corpus, text_col, id_col).localCheckpoint(
            eager=True
        )

    # Corpus scalars: N docs, average doc length. Two numbers to the
    # driver (same contract as tfidf_top_terms' n_docs); avgdl is the
    # IEEE division of two exact integers, reproduced verbatim in SQL.
    # N comes from a metadata-cheap count; the token total is read off
    # the pinned postings (sum of tf == sum of per-doc lengths — docs
    # with zero tokens contribute 0 either way) instead of re-tokenizing
    # the corpus (r12: this was a second full corpus pass per ranker).
    n_docs = corpus.count()
    if not n_docs:  # empty corpus: avgdl undefined
        id_t = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"query_id long, rank int, doc_id {id_t}, score double"
        )
    sum_dl = postings.agg(F.sum("tf")).first()[0] or 0
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


def ql_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    mu: float = 300.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by Dirichlet-smoothed query
    likelihood (Zhai & Lafferty 2004) — the language-modeling ranker
    classically hybridized with BM25. Uses the sparse decomposition
      score(q,d) = sum_{t in q, tf>0} ln(1 + tf / (mu * p(t|C)))
                 + |q| * ln(mu / (dl + mu))
    so only MATCHED postings are scored (docs matching no query term
    are not candidates, the standard top-k contract).

    Determinism: both transcendentals are snapped to the 1e-6 integer
    grid per term (BIGINT contributions, integer sums); p(t|C) =
    ctf/total is evaluated with identical IEEE association in the SQL
    oracle.

    Scale shape: identical to bm25_topk — ONE postings build with
    map-side combine, a query-vocabulary-sized ctf table broadcast
    back, the query frame broadcast into the postings scan, one
    groupBy(query, doc) integer sum + one per-query top-k window;
    corpus-global state = one scalar (total tokens) + the ctf table."""
    q = queries.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("term").cast("string").alias("term"),
    ).distinct()

    if postings is None:
        # same pinning rationale as bm25_topk (r12): two consumers (ctf
        # + scoring) and the scalar below — tokenize the corpus once
        postings = build_postings(corpus, text_col, id_col).localCheckpoint(
            eager=True
        )
    # corpus token total == sum of tf over the pinned postings (r12:
    # replaces a second full corpus tokenize pass); identical integer
    # sum, order-independent
    total = postings.agg(F.sum("tf")).first()[0]
    if not total:  # empty corpus (or all-empty docs): no candidates
        id_t = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"query_id long, rank int, doc_id {id_t}, score double"
        )
    total = float(total)

    ctf = (
        postings.groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
        .join(F.broadcast(q.select("term").distinct()), "term")
    )
    # matched-term contribution on the 1e-6 integer grid
    cq = F.round(
        F.log(
            F.lit(1.0)
            + F.col("tf").cast("double")
            / (F.lit(mu) * F.col("ctf").cast("double") / F.lit(total))
        )
        * F.lit(1e6)
    ).cast("long")
    matched = (
        postings.join(F.broadcast(q), "term")
        .join(F.broadcast(ctf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(cq).alias("mq"), F.max("dl").alias("dl"))
    )
    nq = q.groupBy("query_id").agg(F.count(F.lit(1)).alias("nq"))
    len_q = F.round(
        F.log(F.lit(mu) / (F.col("dl").cast("double") + F.lit(mu))) * F.lit(1e6)
    ).cast("long")
    scored = matched.join(F.broadcast(nq), "query_id").select(
        "query_id",
        "doc_id",
        (F.col("mq") + F.col("nq") * len_q).alias("score_q"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.col("score_q").cast("double") / F.lit(1e6)).alias("score"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N rankers'
    (query_id, rank, doc_id) frames: rrf(q,d) = sum_r 1/(k + rank_r),
    the standard score-free hybrid used to combine lexical and
    LM/dense retrieval. Contributions are BIGINT-quantized on a 1e9
    grid (1e9/(60+rank) never lands on a .5 boundary: the odd divisors
    of 2e9 are powers of 5, none in a plausible k+rank range), summed
    exactly, final order (rrf_q DESC, doc_id ASC).

    Scale shape: a union of ranker outputs (each already top-k-bounded,
    so |queries| x k x N rows total — NOT corpus-scaled) and one
    groupBy(query, doc) integer sum + one per-query top-k window."""
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    u = rankings[0].select("query_id", "rank", "doc_id")
    for r in rankings[1:]:
        u = u.unionByName(r.select("query_id", "rank", "doc_id"))
    contrib = F.round(
        F.lit(1e9) / (F.lit(float(k)) + F.col("rank").cast("double"))
    ).cast("long")
    g = u.groupBy("query_id", "doc_id").agg(F.sum(contrib).alias("rrf_q"))
    w = W.partitionBy("query_id").orderBy(
        F.col("rrf_q").desc(), F.col("doc_id").asc()
    )
    return (
        g.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (
                F.round(F.col("rrf_q").cast("double") / F.lit(1000.0)).cast("long")
                / F.lit(1e6)
            ).alias("rrf_score"),
        )
    )


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    query_vectors: DataFrame,
    index_path: str | None = None,
    dense: str = "ivf",
    k: int = 20,
    topk: int = 10,
    rrf_k: int = 60,
    n_probe: int = 4,
    n_lists: int = 16,
    q_id_col: str = "vec_id",
    source_path: str | None = None,
) -> DataFrame:
    """Dense+lexical hybrid retrieval in one call: BM25 ranks ``docs``
    top-``k`` for ``queries`` (term frames from ``head_term_queries``),
    the dense backend ranks ``embeddings`` top-``k`` for
    ``query_vectors``, and ``rrf_fuse`` merges both lists into a final
    top-``topk``. This is THE hybrid lineage (r10, r09 verdict #6) —
    the two gate shapes are its two dense backends:

    - ``dense="ivf"`` (DEFAULT — the 100 TB scale path): probes the
      materialized IVF list index at ``index_path`` via
      ``ivf_topk_indexed_multi`` — each query reads ``n_probe`` of
      ``n_lists`` list partitions through log file skipping, so dense
      cost is fixed by |queries| x n_probe, independent of corpus size.
      Builds the index on first use if absent (one-time O(corpus),
      amortized across every indexed workload sharing the path; the
      build races LOUDLY — ``mode='error'`` — so a concurrent caller
      loses the create, observes the now-existing index, and reads it).
      When ``source_path`` names the Delta table the embeddings live in,
      the index is kept CURRENT through ``sync_ivf_index``
      (operators/index_sync.py — r11): init-or-sync runs before the
      probe, so embedding churn (takedowns, re-embeds, new crawls)
      reaches the dense ranking at O(changes) cost instead of an
      O(corpus) rebuild.
    - ``dense="exact"``: brute-force cosine over a full corpus scan
      (``dense_topk``, two-phase sharded top-k). Kept as a first-class
      backend deliberately, NOT legacy: exact dense is the recall
      yardstick the ANN-recall gate measures the IVF path against, and
      the right choice below ~1M vectors where a scan beats index
      maintenance. Both backends stay benched for that reason.
    """
    from delta_rs_spark.functions.similarity import (
        build_ivf_index,
        dense_topk,
        ivf_topk_indexed_multi,
    )
    from delta_rs_spark.table import DeltaTable

    lex = bm25_topk(docs, queries, k=k)
    if dense == "exact":
        den = dense_topk(embeddings, query_vectors, k=k, q_id_col=q_id_col)
    elif dense == "ivf":
        if not index_path:
            raise ValueError("dense='ivf' requires index_path")
        if source_path is not None:
            from delta_rs_spark.operators.index_sync import sync_ivf_index

            sync_ivf_index(
                query_vectors.sparkSession,
                source_path,
                index_path,
                n_lists=n_lists,
            )
        elif not DeltaTable.is_deltatable(index_path):
            from delta_rs_spark.log.commit import DeltaError

            try:
                build_ivf_index(
                    embeddings, index_path, n_lists=n_lists, mode="error"
                )
            except DeltaError:
                # concurrent first-build race: the other writer's create
                # committed v0 between our existence check and commit —
                # proceed as a reader of the index that now exists
                if not DeltaTable.is_deltatable(index_path):
                    raise
        den = ivf_topk_indexed_multi(
            query_vectors.sparkSession,
            index_path,
            query_vectors,
            k=k,
            n_probe=n_probe,
            q_id_col=q_id_col,
        )
    else:
        raise ValueError(f"unknown dense backend {dense!r}")
    return rrf_fuse([lex, den], k=rrf_k, topk=topk)


def bm25_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Lexical hard-negative mining (the DPR recipe, Karpukhin 2020):
    for each query, the top BM25-ranked corpus documents that are NOT
    among the query's known positives — the highest-value negatives for
    training a dense retriever, because they are lexically confusable
    with the answer. ``positives`` is a (query_id, doc_id) frame.

    Returns (query_id, rank, doc_id, score) with rank re-numbered over
    the surviving negatives.

    Scale shape: one bm25_topk pass fetching k + max positives per
    query (top-k-bounded), a broadcast anti-join against the positives
    frame (training labels — never corpus-scaled), one re-rank window
    over <= k+p rows per query."""
    pos = positives.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col(id_col).alias("doc_id"),
    ).distinct()
    # fetch enough candidates that excluding every positive still
    # leaves k negatives (a scalar count to the driver: label-sized)
    max_pos = pos.groupBy("query_id").count().agg(F.max("count")).first()[0]
    fetch = k + int(max_pos or 0)
    ranked = bm25_topk(
        corpus, queries, k=fetch, text_col=text_col, id_col=id_col,
        postings=postings,
    )
    negs = ranked.join(F.broadcast(pos), ["query_id", "doc_id"], "left_anti")
    w = W.partitionBy("query_id").orderBy(F.col("rank").asc())
    return (
        negs.withColumn("nrank", F.row_number().over(w))
        .filter(F.col("nrank") <= k)
        .select("query_id", F.col("nrank").alias("rank"), "doc_id", "score")
    )


def mmr_rerank(
    ranking: DataFrame,
    vectors: DataFrame,
    m: int = 8,
    lam_num: int = 7,
    lam_den: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998)
    of a top-k ranking: greedily pick the candidate maximizing
    ``lam*rel - (1-lam)*max_sim_to_already_selected`` — the standard
    post-retrieval DIVERSIFICATION step that stops k near-duplicate
    passages from filling a RAG training context. Input is any
    (query_id, rank, doc_id, score) frame (dense_topk /
    ivf_topk_indexed_multi / rrf_fuse output with score), ``vectors``
    supplies candidate embeddings; returns (query_id, mmr_rank,
    doc_id, mmr_score) with ``m`` rows per query.

    Determinism contract: lambda is the EXACT rational
    lam_num/lam_den, relevance (already on the repo's 4dp grid) and
    pairwise cosines are quantized to BIGINT on a 1e4 grid with
    half-away rounding (matching SQL ``round``), so every greedy
    comparison is integer arithmetic with a doc-id tiebreak —
    replayable step-for-step by a SQL oracle.

    Scale shape: the input is top-k-bounded (|queries| x k rows, never
    corpus-scaled), one shuffle on query_id, and each applyInPandas
    group does an O(k^2 d) local computation — the per-query greedy
    argmax is inherently sequential, which is exactly the sanctioned
    Arrow-batched escape hatch (k <= a few hundred; corpus-scale work
    happened upstream in the ranker). Candidates without a vector are
    dropped (inner join) — rank over what you can diversify."""
    import pandas as pd

    if not (0 < lam_num <= lam_den):
        raise ValueError(f"lambda must be in (0, 1]: {lam_num}/{lam_den}")
    cand = ranking.join(
        vectors.select(
            F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__v")
        ),
        "doc_id",
    ).select("query_id", "doc_id", "score", "__v")
    mu = int(lam_num)
    nu = int(lam_den) - int(lam_num)
    m_cap = int(m)

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        n = len(pdf)
        V = np.array(pdf["__v"].tolist(), dtype=np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
        cos = Vn @ Vn.T
        # half-AWAY rounding (SQL round), not numpy's half-even
        sims = (np.floor(np.abs(cos) * 1e4 + 0.5) * np.sign(cos)).astype("int64")
        rel = (
            np.floor(np.abs(pdf["score"].to_numpy()) * 1e4 + 0.5)
            * np.sign(pdf["score"].to_numpy())
        ).astype("int64")
        ids = pdf["doc_id"].to_numpy()
        maxsim = np.zeros(n, dtype="int64")
        taken = np.zeros(n, dtype=bool)
        out = []
        for step in range(1, min(m_cap, n) + 1):
            val = mu * rel - nu * maxsim
            val_masked = np.where(taken, np.iinfo("int64").min, val)
            best = val_masked.max()
            pick = int(np.flatnonzero(val_masked == best)[0])  # ids sorted asc
            out.append((int(pdf["query_id"].iloc[0]), step, int(ids[pick]),
                        float(val[pick]) / (lam_den * 1e4)))
            taken[pick] = True
            maxsim = np.maximum(maxsim, sims[:, pick])
        return pd.DataFrame(
            out, columns=["query_id", "mmr_rank", "doc_id", "mmr_score"]
        )

    return cand.groupBy("query_id").applyInPandas(
        _mmr,
        "query_id long, mmr_rank int, doc_id long, mmr_score double",
    )
