"""Deterministic sampling for training-data pipelines.

Data mixing (per-source sampling rates) and train/holdout splitting
must be REPRODUCIBLE at 100 TB: rerunning the pipeline, adding
executors, or repartitioning the corpus must select the same rows.
RNG-based sampling (``df.sample``) gives none of that — these operators
decide membership by hashing the row's stable id, so membership is a
pure function of (id, salt), is exactly re-computable by any engine
(the DuckDB oracle replays it), and rates can be audited after the
fact by re-hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # rate resolution: 1e-6


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """md5-derived bucket in [0, 1e6): cross-engine reproducible
    (DuckDB twin: ('0x' || substr(md5(...),1,15))::BIGINT % 1000000)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(_BUCKETS)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by the row
    id's hash bucket — the data-mixing primitive (sample web at 0.3,
    books at 1.0, ...). Per-stratum keep-rate concentrates to the target
    (each id hashes independently); changing ``salt`` draws a fresh
    deterministic sample."""
    rate = F.lit(float(default_rate))
    for k in sorted(rates):  # sorted: plan text stable across runs
        rate = F.when(F.col(stratum_col) == k, F.lit(float(rates[k]))).otherwise(rate)
    keep = _hash_bucket(F.col(id_col), salt) < (rate * _BUCKETS).cast("long")
    return df.filter(keep)


def train_holdout_split(
    df: DataFrame,
    holdout_frac: float = 0.01,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Tag every row 'train' or 'holdout' by id hash — disjoint and
    exhaustive by construction, stable across reruns, and safe against
    leakage as long as ``id_col`` identifies the dedup unit."""
    cut = int(round(holdout_frac * _BUCKETS))
    split = F.when(
        _hash_bucket(F.col(id_col), salt) < F.lit(cut), F.lit("holdout")
    ).otherwise(F.lit("train"))
    return df.withColumn("split", split)


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "tmix-v1",
) -> tuple[DataFrame, dict[str, int]]:
    """Temperature-based source rebalancing (the multilingual-LM mixing
    rule): target shares p_i ~ share_i**alpha, realized by downsampling
    only (no upsampling) -- each source keeps rate_i = share_i**(alpha-1)
    normalized so the most-upweighted source keeps everything. alpha=1
    is a no-op, alpha=0 flattens toward uniform doc counts. Membership
    is the same md5 id-hash as stratified_sample: deterministic,
    engine-reproducible, audit-friendly.

    Returns (sampled rows + rate_ppm column, {source: rate_ppm}).

    Scale shape: pass 1 is one groupBy(source) reduced to |sources| rows
    on the driver (the only global state, like tfidf's n_docs); pass 2
    is a pure scan-filter with the rate map inlined as a literal CASE --
    no join, no shuffle. At 100 TB pass 1 would read the data-mix report
    table (source_mix) instead of rescanning.
    """
    counts = {
        r["source"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("source"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = float(sum(counts.values()))
    raw = {s: (n / total) ** (alpha - 1.0) for s, n in counts.items()}
    m = max(raw.values())
    cuts = {s: int(round(raw[s] * _BUCKETS / m)) for s in sorted(raw)}
    rate = F.lit(None).cast("long")
    for s in sorted(cuts):  # sorted: plan text stable across runs
        rate = F.when(F.col(source_col) == s, F.lit(cuts[s])).otherwise(rate)
    out = (
        df.withColumn("rate_ppm", rate)
        .filter(_hash_bucket(F.col(id_col), salt) < F.col("rate_ppm"))
    )
    return out, cuts


def assign_shards(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "shard-v1",
) -> DataFrame:
    """Deterministic shard assignment for training-data export: shard =
    md5-bucket(id) % n_shards. A pure function of (id, salt, n_shards),
    so re-exports place every doc in the same shard, any engine can
    recompute the mapping, and expected shard sizes are uniform
    regardless of id distribution (sequential ids, snowflakes, uuids
    all hash flat)."""
    return df.withColumn(
        "shard", (_hash_bucket(F.col(id_col), salt) % F.lit(n_shards)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "shard-v1",
    mode: str = "overwrite",
):
    """Materialize the training corpus as a Delta table partitioned by
    shard: downstream trainers read shard = i through partition pruning
    (one loader rank per shard), and the table's transaction log gives
    the export exactly-once semantics and a version to pin in the
    training config.

    Scale shape: one repartition ON the shard column (so each shard's
    rows land in the writer tasks for that partition — no
    small-files-per-task explosion: tasks x shards files otherwise),
    then a partitioned Delta write. Returns the DeltaTable.
    """
    from delta_rs_spark import DeltaTable, write_deltalake

    sharded = assign_shards(df, n_shards, id_col, salt).repartition(
        F.col("shard")
    )
    write_deltalake(path, sharded, mode=mode, partition_by=["shard"])
    return DeltaTable(path)


def domain_cap(
    df: DataFrame,
    cap: int = 20,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap — the CommonCrawl-pipeline guard against
    a single domain flooding the corpus: keep at most ``cap`` docs per
    ``group_col``, ranked by quality score (desc) with id as the
    deterministic tie-break. Output keeps the rank so downstream mixing
    can tighten the cap without re-ranking.

    Scale shape: one window shuffle keyed on the domain. A pathological
    heavy-hitter domain concentrates its rank window on one task; since
    only ``cap`` rows per domain survive, the skew fix at that point is
    the standard two-phase top-N (per-partition partial top-cap, then
    the final window over <= cap * shuffle_partitions rows per domain) —
    not needed at the corpus profiles measured here (AQE splits the
    moderate skew)."""
    from pyspark.sql import Window as W

    from delta_rs_spark.functions.text import quality_score

    r = F.row_number().over(
        W.partitionBy(group_col).orderBy(
            F.desc("__q"), F.asc(id_col)
        )
    )
    return (
        df.withColumn("__q", quality_score(text_col))
        .withColumn("rank_in_domain", r)
        .filter(F.col("rank_in_domain") <= cap)
        .drop("__q")
    )


def token_budget_cap(
    df: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source TOKEN budgets — the "sample 50B tokens of web, 5B of
    code" mixing primitive. domain_cap bounds documents; training mixes
    are specified in tokens, so this ranks each source's docs by quality
    (DESC, id ASC) and keeps the prefix whose cumulative token count
    stays within the source's budget (a doc that would cross the line is
    dropped, as are all below it — the deterministic greedy prefix).

    Returns (id, source, n_tokens, cum_tokens, keep); all-integer
    arithmetic, so the cut is bit-reproducible in any engine.

    Scale shape: one scoring map + ONE window shuffle keyed by source
    (rank and running sum share the frame). Same heavy-domain caveat as
    domain_cap; budgets bound survivors, so the two-phase top-N rewrite
    applies if a domain's raw volume concentrates one task."""
    from pyspark.sql import Window as W

    from delta_rs_spark.functions.text import quality_score, token_count

    budget = F.lit(int(default_budget))
    for k in sorted(budgets):  # sorted: plan text stable across runs
        budget = F.when(F.col(source_col) == k, F.lit(int(budgets[k]))).otherwise(
            budget
        )
    w = (
        W.partitionBy(source_col)
        .orderBy(F.desc("__q"), F.asc(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(source_col),
            token_count(text_col).cast("long").alias("n_tokens"),
            quality_score(text_col).alias("__q"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            id_col,
            source_col,
            "n_tokens",
            "cum_tokens",
            (F.col("cum_tokens") <= budget).alias("keep"),
        )
    )


def epoch_permutation(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "epoch-0",
) -> DataFrame:
    """Deterministic global training order for one epoch: every doc gets
    (shard, pos) from its id hash — shard = md5-bucket mod n_shards
    (assign_shards' mapping), pos = the doc's rank within its shard by
    (md5-bucket, id). Reshuffling an epoch = changing ``salt``
    ("epoch-1", ...). The order is a pure function of (id, salt,
    n_shards): re-exports reproduce it, any engine can audit it, and a
    trainer resuming mid-epoch can recompute exactly which docs remain —
    the reproducibility property RNG shuffles cannot give at 100 TB.

    Scale shape: one hash map + ONE window shuffle keyed by shard
    (ranks only within shards — no global total order is materialized;
    the global order is the (shard, pos) lexicographic composite)."""
    from pyspark.sql import Window as W

    h = _hash_bucket(F.col(id_col), salt)
    w = W.partitionBy("shard").orderBy(F.asc("__h"), F.asc(id_col))
    return (
        df.select(
            F.col(id_col),
            h.alias("__h"),
            (h % F.lit(n_shards)).cast("int").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .select(id_col, "shard", "pos")
    )


def importance_resampling(
    df: DataFrame,
    target: Column,
    vocab_size: int = 128,
    keep_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much its unigram distribution looks like a TARGET domain versus
    the raw corpus, then keep the top ``keep_frac``. The standard move
    for "I have 100 TB of web text and 1 GB of the distribution I
    actually want" — the target here is any boolean Column over the
    corpus itself (e.g. ``source == 'curated'``).

    Model: vocabulary = top ``vocab_size`` corpus terms by collection
    frequency (term ASC tie-break); add-one-smoothed unigram probs over
    that vocabulary for target and raw; per-doc importance weight =
    mean over the doc's in-vocab token OCCURRENCES of
    ln(p_target(w) / p_raw(w)). Docs with no in-vocab tokens weight 0.

    Determinism: each term's log-ratio is snapped to a 1e-6 grid (the
    one transcendental), the per-(doc,term) contribution tf * lambda is
    basic-op exact, quantized to BIGINT on a 1e9 grid, and the per-doc
    mean is derived from the integer sum — so the keep cut's ordering
    (weight DESC, id ASC) is bit-reproducible in the DuckDB oracle.

    Scale shape: one explode + groupBy(doc, term) shuffle (shared shape
    with tfidf/BM25 postings), ONE vocabulary-sized aggregation joined
    back by broadcast, one groupBy(doc) integer sum, one global
    percent_rank window for the cut. Corpus-global state = the
    (vocab_size)-row lambda table; nothing row-scaled hits the driver.
    At 100 TB the single-partition global window is the known cost
    center — production would histogram the 6dp weights and derive the
    fence from counts; gate scale keeps the exact oracle-checkable
    window.

    Cache lifetime: the call runs the postings build eagerly
    (localCheckpoint + a vocab-sized totals job) and the returned plan
    reads the checkpointed postings and a persist()-pinned
    ``vocab_size``-row lambda table; long-lived sessions composing many
    queries should call ``session.drop_cached_intermediates`` once
    results are consumed.
    """
    from pyspark.sql import Window as W

    from delta_rs_spark.functions.text import tokens

    term_rows = df.select(
        F.col(id_col).alias("doc_id"),
        target.cast("boolean").alias("is_tgt"),
        F.explode(tokens(text_col)).alias("term"),
    )
    # ONE tokenize+explode pass: the (doc, term, tf, is_tgt) postings
    # frame (is_tgt is doc-constant, so max() over the group is exact)
    # is pinned and serves BOTH the vocabulary counts and the per-doc
    # scoring join — previously each re-ran the corpus explode (the
    # BM25 postings-pinning precedent; postings-sized, never text-sized)
    doc_terms = (
        term_rows.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("is_tgt").alias("is_tgt"))
        .localCheckpoint(eager=True)
    )
    # identical totals: n_raw = Σ tf over docs; n_tgt = Σ tf over
    # target docs (NULL is_tgt counted 0, as when(is_tgt,1) did)
    counts = doc_terms.groupBy("term").agg(
        F.sum("tf").alias("n_raw"),
        F.sum(F.when(F.col("is_tgt"), F.col("tf")).otherwise(0)).alias("n_tgt"),
    )
    # vocab_size rows, referenced by the scalar totals AND the broadcast
    # lambda join — persisted so the top-k sort runs once
    vocab = counts.orderBy(
        F.col("n_raw").desc(), F.col("term").asc()
    ).limit(vocab_size).persist()

    # Smoothing totals: three scalars to the driver (vocab-sized agg;
    # also materializes the persist).
    tot = vocab.select(
        F.sum("n_raw").alias("raw"), F.sum("n_tgt").alias("tgt")
    ).first()
    tot_raw, tot_tgt = float(tot["raw"]), float(tot["tgt"])
    v = float(vocab_size)

    # lambda(term) = ln(p_tgt / p_raw), snapped to the 1e-6 grid.
    # p_* are IEEE divisions of exact integers — identical in SQL.
    lam_q = (
        F.round(
            F.log(
                (
                    (F.col("n_tgt").cast("double") + F.lit(1.0))
                    / F.lit(tot_tgt + v)
                )
                / (
                    (F.col("n_raw").cast("double") + F.lit(1.0))
                    / F.lit(tot_raw + v)
                )
            )
            * F.lit(1e6)
        )
        / F.lit(1e6)
    ).alias("lam")

    per_doc = (
        doc_terms.join(F.broadcast(vocab.select("term", lam_q)), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.round(F.col("tf").cast("double") * F.col("lam") * F.lit(1e9)).cast(
                    "long"
                )
            ).alias("sum_q"),
            F.sum("tf").alias("n_vocab_tokens"),
        )
    )
    joined = df.select(F.col(id_col).alias("doc_id")).join(
        per_doc, "doc_id", "left"
    )
    # 6dp weight via an integer micro-grid: round-to-INTEGER is
    # boundary-safe across engines (both round half away from zero on
    # the same double), unlike round(x, 6) whose decimal-vs-scaled
    # implementations disagree when x sits on a 1e-6 half-boundary
    # (sum_q/n/1e9 is rational — it lands on boundaries for real).
    weight = F.coalesce(
        F.round(
            F.col("sum_q").cast("double")
            / (F.col("n_vocab_tokens").cast("double") * F.lit(1000.0))
        ).cast("long")
        / F.lit(1e6),
        F.lit(0.0),
    )
    w = W.orderBy(F.asc("weight"), F.asc("doc_id"))
    pct = F.round(F.percent_rank().over(w), 6)
    return (
        joined.select(
            "doc_id",
            F.coalesce("n_vocab_tokens", F.lit(0)).alias("n_vocab_tokens"),
            weight.alias("weight"),
        )
        .select(
            "doc_id",
            "n_vocab_tokens",
            "weight",
            pct.alias("pct"),
            (pct >= F.lit(1.0) - F.lit(keep_frac)).alias("keep"),
        )
    )


def calibrate_quality_per_source(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_frac: float = 0.5,
) -> DataFrame:
    """Per-domain quality calibration: raw quality scores are not
    comparable ACROSS sources (a mid-tier web page outscores a top-tier
    forum post on raw heuristics), so global filtering by raw score
    skews the mix toward whichever domain's score distribution sits
    higher. Replace each doc's score with its percentile rank WITHIN its
    source, then keep the top ``keep_frac`` of every source — the
    standard mix-preserving quality cut. Returns (id, source, score,
    pct, keep); pct is percent_rank (0 = worst in source, 1 = best),
    keep = pct >= 1 - keep_frac, both deterministic via the
    (score, id) ordering.

    Scale shape: one codegen scoring map + ONE window shuffle keyed by
    source. Source skew (one giant domain) is percentile-rank's known
    cost center; a production run at 100 TB would pre-aggregate to
    score-histogram ranks per source (same result on a 1e-6 grid) —
    at gate scale the exact window is the honest oracle-checkable
    form."""
    from delta_rs_spark.functions.text import quality_score
    from pyspark.sql import Window as W

    w = W.partitionBy(source_col).orderBy(
        F.asc("score"), F.asc(id_col)
    )
    scored = df.select(
        F.col(id_col),
        F.col(source_col),
        quality_score(F.col(text_col)).alias("score"),
    )
    pct = F.round(F.percent_rank().over(w), 6)
    return scored.select(
        id_col,
        source_col,
        "score",
        pct.alias("pct"),
        (pct >= F.lit(1.0) - F.lit(keep_frac)).alias("keep"),
    )
