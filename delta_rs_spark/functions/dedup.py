"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB regime:

* exact dedup is a hash groupBy (one shuffle on the fingerprint);
* MinHash+LSH turns all-pairs O(n²) into per-band bucket self-joins —
  only documents sharing a band bucket are compared, the classic
  shingle -> minhash -> band -> bucket-join pipeline;
* SimHash reduces each doc to a 64-bit signature; near-dup candidates
  share a 16-bit band (hamming-distance blocking);
* n-gram Jaccard is the exact verifier: explode word sets, equi-join on
  token, count overlaps — a shuffle join on tokens, not a cross join.

Everything is built-in Spark expressions (xxhash64, explode, groupBy) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from delta_rs_spark.functions.text import fingerprint, shingles, tokens


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per exact (normalized) text.
    One hash-shuffle on the fingerprint; no sort of the full data."""
    w = W.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp", fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_copies, representative id) for groups with > 1 doc."""
    return (
        df.groupBy(fingerprint(text_col).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """MinHash signature per document: min over shingles of
    xxhash64(shingle, seed) for each of ``num_perm`` seeded permutations.
    Computed entirely with array expressions — one projection, no shuffle."""
    sh = shingles(text_col, shingle_size)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_perm)
        ]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded LSH:
    docs agreeing on any band of ``num_perm/bands`` minhashes collide.
    Returns (id_a, id_b, est_jaccard) with the signature-estimated
    Jaccard (fraction of agreeing permutations)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_size)
    banded = sigs.select(
        "id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "signature", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
            )
        ).cast("double")
        / F.lit(float(num_perm))
    )
    return pairs.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: sign-sum over token-hash bits, shaped as
    explode -> one groupBy with ``bits`` partial-aggregating sums (map-side
    combine keeps the shuffle at one row per doc, not per token)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy("id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim.bitwiseOR(
            F.when(
                F.col(f"b{b}") > 0,
                F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"),  # b=63: sign bit
            ).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("id", sim.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_size: int | None = 3,
) -> DataFrame:
    """Exact n-gram-set Jaccard for all pairs sharing >= 1 shingle:
    explode distinct shingles -> self-equi-join -> overlap counts.
    A shuffle join on shingles (skew-prone on ultra-common n-grams — at
    real scale feed this only LSH candidates or drop top-frequency
    shingles). ``shingle_size=None`` degrades to word-set Jaccard."""
    units = (
        shingles(text_col, shingle_size) if shingle_size else tokens(text_col)
    )
    # join on the 64-bit hash of the shingle, not the string: smaller
    # shuffle rows and cheaper equality; AQE skew-join splits hot shingles
    base = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(units)).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("tok"))
    sizes = base.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
    # carry set sizes on every exploded row: J(A,B) >= t forces
    # min(|A|,|B|) >= t*max(|A|,|B|), so size-incompatible pairs can be
    # rejected INSIDE the join (exact — no false negatives) before the
    # quadratic per-shingle pair blowup
    toks = base.join(sizes, "id")
    a, b = toks.alias("a"), toks.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.n_tok") >= threshold * F.col("b.n_tok"))
            & (F.col("b.n_tok") >= threshold * F.col("a.n_tok")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = (
        overlap.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common")
                / (F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_common")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact, via block matrix
    multiply: one side is broadcast as a normalized numpy matrix, the
    other streams through mapInPandas computing a BLAS ``A @ B.T`` per
    Arrow batch (~100x faster than a pair-expression cross join). At
    larger-than-broadcast scale the same kernel tiles the broadcast side;
    LSH bucketing (functions/similarity.py) is the sub-quadratic path."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pdf = df.select(id_col, vec_col).toPandas()
    ids_all = pdf[id_col].to_numpy()
    m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    bc = spark.sparkContext.broadcast((ids_all, m))

    def op(batches):
        bids, bm = bc.value
        for batch in batches:
            if not len(batch):
                continue
            a = np.array(batch[vec_col].tolist(), dtype=np.float64)
            a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-300)
            s = a @ bm.T
            aids = batch[id_col].to_numpy()
            ia, ib = np.nonzero((s >= threshold) & (aids[:, None] < bids[None, :]))
            yield pd.DataFrame(
                {"id_a": aids[ia], "id_b": bids[ib], "cos": np.round(s[ia, ib], 4)}
            )

    # enough partitions to parallelize the matmul blocks, few enough that
    # python-worker startup does not dominate on small inputs
    n_parts = max(1, min(16, len(ids_all) // 256))
    return (
        df.select(id_col, vec_col)
        .repartition(n_parts)
        .mapInPandas(op, "id_a long, id_b long, cos double")
    )
