"""KMV sketch correctness: exact bottom-k construction (pruned and
fallback paths identical), estimator accuracy against exact distinct /
Jaccard on synthetic overlapping sources, and the saturated-sketch
exactness guarantees."""

import pytest
from pyspark.sql import functions as F

from delta_rs_spark.functions import sketches as K


def _corpus(spark, n_sources=3, docs_per=40, overlap_docs=15):
    """Synthetic sources sharing a common slice of documents: source i
    owns docs [i*1000, i*1000+docs_per) plus the shared [0, overlap)."""
    rows = []
    for s in range(n_sources):
        ids = list(range(s * 1000, s * 1000 + docs_per)) + list(range(overlap_docs))
        for d in ids:
            words = " ".join(f"w{d}x{j}" for j in range(8))
            rows.append((f"src{s}", words))
    return spark.createDataFrame(rows, "source string, text string")


def _exact_shingle_sets(df):
    from delta_rs_spark.functions.text import shingles

    rows = (
        df.select("source", F.explode(shingles("text", 3)).alias("s"))
        .distinct()
        .collect()
    )
    sets = {}
    for r in rows:
        sets.setdefault(r["source"], set()).add(r["s"])
    return sets


def test_sketch_is_exact_bottom_k(spark):
    df = _corpus(spark)
    k = 16
    sk = K.kmv_sketch(df, "source", "text", k=k, hash_fn="md5").collect()
    # brute force: hash every distinct shingle, take the k smallest
    from delta_rs_spark.functions.dedup import hash64
    from delta_rs_spark.functions.text import shingles

    h = hash64("md5")
    brute = (
        df.select("source", F.explode(shingles("text", 3)).alias("s"))
        .select("source", h(F.col("s")).bitwiseAND(F.lit(K.KMV_DOMAIN - 1)).alias("h"))
        .distinct()
        .collect()
    )
    per_src = {}
    for r in brute:
        per_src.setdefault(r["source"], []).append(r["h"])
    got = {}
    for r in sk:
        got.setdefault(r["source"], []).append((r["rank"], r["h"], r["sketch_size"]))
    for src, hs in per_src.items():
        want = sorted(hs)[:k]
        rows = sorted(got[src])
        assert [h for _, h, _ in rows] == want
        assert [rk for rk, _, _ in rows] == list(range(1, len(want) + 1))
        assert all(ss == min(k, len(hs)) for _, _, ss in rows)


def test_prune_fallback_matches_pruned_path(spark):
    """prune_factor=0 zeroes the threshold, forcing every group through
    the verified fallback — output must be identical to the pruned path."""
    df = _corpus(spark)
    a = K.kmv_sketch(df, "source", "text", k=12, hash_fn="md5", prune_factor=0)
    b = K.kmv_sketch(df, "source", "text", k=12, hash_fn="md5", prune_factor=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_unsaturated_sketch_estimates_are_exact(spark):
    """sketch_size < k => the sketch IS the distinct set: distinct,
    union, Jaccard, intersection all exact."""
    df = _corpus(spark, n_sources=2, docs_per=10, overlap_docs=4)
    sets = _exact_shingle_sets(df)
    k = 4096  # far above any source's distinct count
    sk = K.kmv_sketch(df, "source", "text", k=k, hash_fn="md5")
    est = {r["source"]: r for r in K.kmv_distinct(sk, "source", k).collect()}
    for src, s in sets.items():
        assert est[src]["est_distinct"] == float(len(s))
        assert est[src]["sketch_size"] == len(s)
    ov = K.kmv_overlap(sk, "source", k).collect()
    assert len(ov) == 1
    r = ov[0]
    a, b = sets["src0"], sets["src1"]
    assert r["est_union"] == float(len(a | b))
    assert r["est_jaccard"] == round(len(a & b) / len(a | b), 4)
    assert r["est_intersection"] == pytest.approx(len(a & b), abs=0.51)


def test_saturated_estimates_within_tolerance(spark):
    """k=64 sketches over a few thousand distinct shingles: relative
    error concentrates at ~1/sqrt(k) (±12.5% at one sigma); assert a
    generous 4-sigma band so the test is deterministic-stable."""
    df = _corpus(spark, n_sources=2, docs_per=400, overlap_docs=150)
    sets = _exact_shingle_sets(df)
    k = 64
    sk = K.kmv_sketch(df, "source", "text", k=k, hash_fn="md5")
    est = {r["source"]: r for r in K.kmv_distinct(sk, "source", k).collect()}
    for src, s in sets.items():
        assert est[src]["sketch_size"] == k
        assert abs(est[src]["est_distinct"] - len(s)) / len(s) < 0.5
    r = K.kmv_overlap(sk, "source", k).collect()[0]
    a, b = sets["src0"], sets["src1"]
    true_j = len(a & b) / len(a | b)
    assert abs(r["est_union"] - len(a | b)) / len(a | b) < 0.5
    assert abs(r["est_jaccard"] - true_j) < 0.25
    # disjoint control: fresh corpus with no shared docs
    df2 = _corpus(spark, n_sources=2, docs_per=200, overlap_docs=0)
    sk2 = K.kmv_sketch(df2, "source", "text", k=k, hash_fn="md5")
    r2 = K.kmv_overlap(sk2, "source", k).collect()[0]
    assert r2["est_jaccard"] == 0.0
    assert r2["est_intersection"] == 0.0


def test_xx_and_md5_modes_share_pipeline(spark):
    """Production xxhash64 mode runs the same pipeline (masked to the
    same 60-bit domain) — ranks contiguous, hashes in-domain/ascending."""
    df = _corpus(spark)
    sk = K.kmv_sketch(df, "source", "text", k=8, hash_fn="xx").collect()
    per = {}
    for r in sk:
        assert 0 <= r["h"] < K.KMV_DOMAIN
        per.setdefault(r["source"], []).append((r["rank"], r["h"]))
    for rows in per.values():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        hs = [h for _, h in rows]
        assert hs == sorted(hs)


def test_prune_pairs_exact_for_nonzero_rows(spark):
    """r12 (G >> 10^3 residual): prune_pairs=True generates candidate
    pairs from a sketch self-join on h instead of G^2. With
    min_shared=1 it is EXACT relative to the full estimator — the union
    sample's matched count can only come from hashes in BOTH sketches,
    so every dropped pair estimated jaccard = 0 in the full run."""
    # 6 sources: 0/1/2 share docs, 3/4/5 are pairwise disjoint islands
    rows = []
    for s in range(6):
        ids = list(range(s * 1000, s * 1000 + 30))
        if s < 3:
            ids += list(range(10))  # shared slice among 0,1,2
        for d in ids:
            rows.append((f"src{s}", " ".join(f"w{d}x{j}" for j in range(8))))
    df = spark.createDataFrame(rows, "source string, text string")
    k = 64
    sk = K.kmv_sketch(df, "source", "text", k=k, hash_fn="md5")

    full = {(r["src_a"], r["src_b"]): r for r in K.kmv_overlap(sk, "source", k).collect()}
    pruned = {
        (r["src_a"], r["src_b"]): r
        for r in K.kmv_overlap(sk, "source", k, prune_pairs=True).collect()
    }
    assert len(full) == 15  # all C(6,2) pairs
    # every nonzero full row survives the prune, values identical
    nonzero = {p for p, r in full.items() if r["est_jaccard"] > 0}
    assert nonzero == {("src0", "src1"), ("src0", "src2"), ("src1", "src2")}
    assert nonzero <= set(pruned)
    for p in pruned:
        fr, pr = full[p], pruned[p]
        assert (fr["est_union"], fr["est_jaccard"], fr["est_intersection"]) == (
            pr["est_union"], pr["est_jaccard"], pr["est_intersection"]
        )
    # every full-zero pair the prune DID drop really estimated zero
    for p in set(full) - set(pruned):
        assert full[p]["est_jaccard"] == 0.0

    # min_shared tightens candidacy monotonically
    tight = K.kmv_overlap(sk, "source", k, prune_pairs=True, min_shared=5).collect()
    assert {(r["src_a"], r["src_b"]) for r in tight} <= set(pruned)
