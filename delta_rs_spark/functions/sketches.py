"""K-Minimum-Values (KMV) sketches for cross-source overlap estimation.

At 100 TB a training corpus is assembled from many sources, and the
first question a curation pipeline asks is "how much do these sources
overlap?" — answered exactly, that is a pairwise distinct-shingle
intersection over the whole corpus (O(sources² × corpus) and a shuffle
of every shingle). The KMV sketch (Beyer et al., "On Synopses for
Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007)
answers it from one corpus pass: keep the k smallest distinct hash
values per source, then estimate distinct counts, pairwise union size,
Jaccard, and intersection purely from the k-sized sketches.

Scale design:

* ONE pass builds every source's sketch: shingle → hash → distinct
  (the only corpus-sized shuffle) → per-source bottom-k.
* The bottom-k never sorts a source's full distinct set: hash values
  are uniform on [0, 2^60), so the k-th smallest concentrates at
  ~k/n × 2^60. A per-source threshold of ``prune_factor`` × that value
  (one tiny count-aggregate + a broadcast join) keeps ~prune_factor×k
  rows per source; the exact window sort runs on that sliver. The
  prune is verified (survivors ≥ min(k, n_distinct) per source) and
  falls back to the unpruned sort for any source that lost rows — the
  result is the exact bottom-k either way, the prune only changes cost.
* Pairwise estimation touches ONLY sketches: G sources × k rows in,
  G² × k intermediate — independent of corpus size. (For very large G,
  prune pairs first; at G ≤ 10³ the sketch frames are driver-trivial.)

Estimator (standard KMV, domain D = 2^60):

* distinct(S)  = (k-1) · D / h_(k)         if the sketch is full,
                 |S| exactly               otherwise (sketch == set);
* union(A,B)   = same estimator over K = bottom-k of (S_A ∪ S_B);
                 |K| < k only when BOTH sketches are unsaturated, in
                 which case the union of the exact sets is exact;
* Jaccard(A,B) = |K ∩ S_A ∩ S_B| / |K|  (fraction of the union sample
                 present in both sets);
* intersection = Jaccard × union.

With ``hash_fn="md5"`` every number is reproducible in DuckDB SQL
(see dedup.hash64), so the whole estimator is oracle-checkable;
``"xx"`` (xxhash64) is the production hash — same pipeline, faster.

Reference parity note: delta-rs exposes DataFusion's approx_distinct
(HyperLogLog) through SQL (SURVEY.md §2B aggregations); this module is
the multiset-operations superset a curation pipeline needs (HLL union
exists, but HLL intersection/Jaccard does not compose — KMV does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from delta_rs_spark.functions.dedup import hash64
from delta_rs_spark.functions.text import shingles

# Hash values are masked to 60 bits in BOTH hash modes so the estimator
# domain is one constant: md5-mode hashes are already < 2^60 (15 hex
# chars), xx-mode is masked down. 2^60 and small-multiple numerators are
# exactly representable as doubles.
KMV_DOMAIN = 1 << 60

# Survivor budget per source for the pruned bottom-k, as a multiple of
# k. The k-th smallest of n uniform values sits at k/(n+1)·D with
# relative spread ~1/sqrt(k); 8× leaves the miss probability at
# exp(-Θ(k)) — and a miss only costs the fallback sort, never accuracy.
PRUNE_FACTOR = 8


def kmv_sketch(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 64,
    shingle_n: int = 3,
    hash_fn: str = "xx",
    prune_factor: int = PRUNE_FACTOR,
) -> DataFrame:
    """Per-``group_col`` KMV sketch over word-``shingle_n``-gram hashes.

    Returns ``(group_col, rank, h, sketch_size)``: the ``min(k,
    n_distinct)`` smallest distinct 60-bit shingle hashes per group,
    ``rank`` 1-based ascending, ``sketch_size`` the per-group row count
    (< k means the sketch IS the exact distinct set).
    """
    h = hash64(hash_fn)
    mask = F.lit(KMV_DOMAIN - 1)
    dist = (
        df.select(
            F.col(group_col),
            F.explode(shingles(text_col, shingle_n)).alias("_s"),
        )
        .select(group_col, h(F.col("_s")).bitwiseAND(mask).alias("h"))
        .distinct()
    )

    # Group-cardinality frame: one count per source. Broadcast-joined
    # back so the corpus-sized side never reshuffles. PERSISTED (G rows,
    # r12): without it every consumer of the threshold — the prune join,
    # the verification anchor, and each reference in a downstream
    # estimator plan — re-runs the corpus-sized distinct underneath it.
    counts = dist.groupBy(group_col).agg(F.count("*").alias("_n_distinct")).persist()
    thr = counts.withColumn(
        "_thr",
        F.least(
            F.lit(float(KMV_DOMAIN - 1)),
            F.lit(float(prune_factor * k))
            * F.lit(float(KMV_DOMAIN))
            / F.col("_n_distinct"),
        ).cast("long"),
    )
    pruned = dist.join(F.broadcast(thr), group_col).where(F.col("h") <= F.col("_thr"))

    wk = W.partitionBy(group_col).orderBy("h")
    sketch = (
        pruned.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .withColumn("sketch_size", F.least(F.lit(k), F.col("_n_distinct")))
        .select(group_col, "rank", "h", "sketch_size")
        # G·k rows — persisting it makes the verification below AND the
        # downstream estimators (kmv_distinct / kmv_overlap reference
        # the sketch 4-5x in one plan) read the tiny cached frame
        # instead of re-running the corpus pass per reference (r12:
        # llm_kmv_sketch/llm_source_overlap_kmv ran the shingle-distinct
        # shuffle up to 5x per query)
        .persist()
    )

    # Prune verification: every group must keep min(k, n_distinct)
    # survivors. A shortfall (probability exp(-Θ(k))) reroutes ONLY the
    # short groups through the unpruned exact sort — output identical.
    # The kept-count is derived from the persisted sketch (rows per
    # group == min(kept, k), and the shortfall test only compares below
    # min(k, n_distinct), where the two coincide) so verification costs
    # one tiny job, not another corpus pass.
    kept = sketch.groupBy(group_col).agg(F.count("*").alias("_kept"))
    short = (
        counts.join(kept, group_col, "left")  # anchor on ALL groups — a
        # group whose every hash exceeds the threshold is absent from
        # `pruned` entirely and must still be caught
        .where(
            F.coalesce(F.col("_kept"), F.lit(0))
            < F.least(F.lit(k), F.col("_n_distinct"))
        )
        .select(group_col)
        .collect()
    )
    if short:  # astronomically rare with the default factor; tests force it
        short_keys = [r[0] for r in short]
        redo = (
            dist.where(F.col(group_col).isin(short_keys))
            .withColumn("rank", F.row_number().over(wk))
            .where(F.col("rank") <= k)
        )
        redo_n = redo.groupBy(group_col).agg(F.count("*").alias("_n"))
        redo = (
            redo.join(F.broadcast(redo_n), group_col)
            .withColumn("sketch_size", F.col("_n"))
            .select(group_col, "rank", "h", "sketch_size")
        )
        sketch = sketch.where(~F.col(group_col).isin(short_keys)).unionByName(redo)
    return sketch


def _distinct_est(size_col: str, hmax_col: str, k: int):
    """KMV distinct estimate column: (k-1)·D/h_(k), exact when the
    sketch is the whole set. Numerator built as ONE exact double literal
    so DuckDB can embed the identical constant."""
    num = F.lit(float((k - 1) * KMV_DOMAIN))
    return F.when(F.col(size_col) < k, F.col(size_col).cast("double")).otherwise(
        num / F.col(hmax_col)
    )


def kmv_distinct(sketch: DataFrame, group_col: str = "source", k: int = 64) -> DataFrame:
    """Per-group distinct-shingle estimate from the sketch alone:
    ``(group_col, sketch_size, est_distinct)`` (4dp)."""
    agg = sketch.groupBy(group_col).agg(
        F.max("sketch_size").alias("sketch_size"),
        F.max("h").alias("_hmax"),
    )
    return agg.select(
        group_col,
        "sketch_size",
        F.round(_distinct_est("sketch_size", "_hmax", k), 4).alias("est_distinct"),
    )


def kmv_overlap(
    sketch: DataFrame,
    group_col: str = "source",
    k: int = 64,
    prune_pairs: bool = False,
    min_shared: int = 1,
) -> DataFrame:
    """Pairwise overlap estimates from sketches only (corpus never
    touched): one row per unordered pair ``src_a < src_b`` with
    ``est_a, est_b, est_union, est_jaccard, est_intersection`` (4dp).

    Cost is sketch-bounded: the per-pair union sample is built by
    fanning each group's k rows out to its G-1 pairs — G²·k rows total,
    then a bottom-k per pair. No corpus data moves.

    ``prune_pairs=True`` is the G ≫ 10³ path: candidate pairs come from
    a self-join of the sketches on the hash value (G·k rows keyed by
    h), so the pair count is bounded by ACTUAL sketch collisions
    instead of G². With ``min_shared=1`` this is EXACT relative to the
    full estimator's nonzero rows: the matched count in the union
    sample can only come from hashes present in BOTH sketches, so a
    pair sharing no sketch hash estimates jaccard = intersection = 0
    and is exactly the row pruning drops. ``min_shared > 1`` trades
    that guarantee for a stronger prune (a pair needs min_shared
    sketch collisions to be estimated at all).
    """
    e = sketch.select(F.col(group_col).alias("_src"), "h", "sketch_size")
    srcs = e.select(F.col("_src"), F.col("sketch_size")).distinct()
    if prune_pairs:
        la = sketch.select(F.col(group_col).alias("src_a"), "h")
        rb = sketch.select(F.col(group_col).alias("src_b"), "h")
        pairs = (
            la.join(rb, "h")
            .where(F.col("src_a") < F.col("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.count("*").alias("_shared"))
            .where(F.col("_shared") >= int(min_shared))
            .select("src_a", "src_b")
        )
    else:
        pairs = (
            srcs.select(F.col("_src").alias("src_a"))
            .join(srcs.select(F.col("_src").alias("src_b")), F.col("src_a") < F.col("src_b"))
        )
    fan_a = pairs.join(
        e.select(F.col("_src").alias("src_a"), "h"), "src_a"
    ).select("src_a", "src_b", "h", F.lit(1).alias("fa"), F.lit(0).alias("fb"))
    fan_b = pairs.join(
        e.select(F.col("_src").alias("src_b"), "h"), "src_b"
    ).select("src_a", "src_b", "h", F.lit(0).alias("fa"), F.lit(1).alias("fb"))
    uni = (
        fan_a.unionByName(fan_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("fa").alias("in_a"), F.max("fb").alias("in_b"))
    )
    wp = W.partitionBy("src_a", "src_b").orderBy("h")
    topu = uni.withColumn("r", F.row_number().over(wp)).where(F.col("r") <= k)
    stats = topu.groupBy("src_a", "src_b").agg(
        F.count("*").alias("_ku"),
        F.max("h").alias("_humax"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("_matched"),
    )
    per_side = kmv_distinct(sketch, group_col, k)
    est_a = per_side.select(
        F.col(group_col).alias("src_a"), F.col("est_distinct").alias("est_a")
    )
    est_b = per_side.select(
        F.col(group_col).alias("src_b"), F.col("est_distinct").alias("est_b")
    )
    est_union = _distinct_est("_ku", "_humax", k)
    jac = F.col("_matched").cast("double") / F.col("_ku")
    return (
        stats.join(F.broadcast(est_a), "src_a")
        .join(F.broadcast(est_b), "src_b")
        .select(
            "src_a",
            "src_b",
            "est_a",
            "est_b",
            F.round(est_union, 4).alias("est_union"),
            F.round(jac, 4).alias("est_jaccard"),
            F.round(jac * est_union, 4).alias("est_intersection"),
        )
    )
