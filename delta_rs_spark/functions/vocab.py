"""Distributed BPE vocabulary induction (tokenizer training).

The classic byte-pair-encoding learner (Sennrich et al. 2016) run as a
Spark job: the corpus collapses to a word-frequency table (the standard
BPE preprocessing — all further work is over distinct words, not the
corpus), each word is a character-symbol sequence, and each round
counts adjacent symbol pairs weighted by word frequency, merges the
most frequent pair corpus-wide, and re-segments. Only the winning pair
(one row) crosses the driver per round — the merge table IS the model,
exactly like similarity.kmeans ships centroids.

Determinism for the DuckDB oracle: pair counts are exact integer sums;
the argmax tie-breaks on the space-joined pair string (symbols never
contain spaces, so string order == (left, right) tuple order in both
engines); the merge application is the standard left-to-right
non-overlapping scan, expressed here as a per-word array fold and in
the oracle as the parity-of-candidate-runs rewrite — provably the same
result (within a run of consecutive candidate starts, the scan takes
positions 0, 2, 4, ... relative to the run head).

Scale shape: one corpus pass builds the word table (shuffle keyed by
word, partial-agg combined); each round is one explode of the DISTINCT
words' pair lists plus a pair-keyed aggregation — cost scales with
vocabulary size, not corpus size. The fold runs in Spark's higher-order
aggregate over short char arrays (no Python, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delta_rs_spark.functions.text import tokens


def _chars(col: Column) -> Column:
    """Word -> array of single-character symbols (regexp_extract_all '.'
    — the one splitting rule both engines share verbatim)."""
    return F.regexp_extract_all(col, F.lit("."), F.lit(0))


def _pair_strings(syms: Column) -> Column:
    """Adjacent symbol pairs as 'left right' strings (space-joined —
    symbols are space-free, so the string sorts like the pair tuple)."""
    shifted = F.slice(syms, 2, F.size(syms))
    pairs = F.zip_with(syms, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.slice(pairs, 1, F.greatest(F.size(syms) - 1, F.lit(0)))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping replacement of (left, right) by the
    concatenated symbol — the BPE merge scan as an array fold: append
    each symbol, but when the accumulator's tail is `left` and the
    incoming symbol is `right`, swap the tail for the merged symbol
    (a just-merged tail never re-matches `left` unless the data truly
    re-creates the pair, which is exactly the scan semantics)."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table (w, freq) — the standard BPE
    preprocessing collapse. Learner and vocabulary reporter both start
    from it; a caller running both should build it ONCE, persist it
    (vocabulary-sized, never corpus-sized), and pass it via their
    ``words`` parameter so the corpus tokenize+explode runs once."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


_word_table = word_table


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    words: DataFrame | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(left, right, pair_count), ...] in merge order. ``words``: a
    pre-built (persisted) ``word_table`` to share with ``bpe_vocab``;
    when given, the per-round symbol split re-derives from the cached
    vocabulary rows (vocabulary-sized regex, identical values)."""
    base = words if words is not None else _word_table(df, text_col)
    words_owned = words is None
    words = base.withColumn("syms", _chars(F.col("w")))
    if words_owned:
        words = words.persist()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        cur = F.col("syms")
        for left, right, _n in merges:
            cur = _apply_merge(cur, left, right)
        top = (
            words.select(F.col("freq"), F.explode(_pair_strings(cur)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        left, right = pair.split(" ", 1)
        merges.append((left, right, n))
    if words_owned:
        words.unpersist()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment every document with a learned merge table: (id, pieces
    array<string>) — each whitespace token split to characters, merges
    applied in learned order. Pure map, no shuffle; the model rides as
    plan literals."""
    piece = _chars(F.col("__w"))
    for left, right, _n in merges:
        piece = _apply_merge(piece, left, right)
    per_tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("__i", "__w")
    ).select(F.col(id_col), F.col("__i"), piece.alias("__p"))
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__i", "__p"))),
                    lambda s: s["__p"],
                )
            ).alias("pieces")
        )
    )


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Corpus-wide symbol frequencies after applying a merge table:
    (symbol, n) — the learned subword vocabulary with counts. Computed
    over the word-frequency table (vocabulary-sized work, corpus-sized
    counts). ``words``: a pre-built ``word_table`` (typically the one
    the learner already paid a corpus pass for) to avoid re-tokenizing
    the corpus."""
    if words is None:
        words = _word_table(df, text_col)
    syms = _chars(F.col("w"))
    for left, right, _n in merges:
        syms = _apply_merge(syms, left, right)
    return (
        words.select(F.col("freq"), F.explode(syms).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").cast("long").alias("n"))
    )
