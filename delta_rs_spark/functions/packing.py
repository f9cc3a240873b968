"""Sequence packing: the concat-and-chunk step of LLM pretraining prep.

Documents are concatenated in a deterministic order and sliced into
fixed token-budget training sequences; a document can straddle a chunk
boundary. This operator computes, per document, where its tokens land:
the running token offset, the first chunk id, and how many chunks it
spans — the bookkeeping a downstream tokenizer/writer needs to emit
packed sequences without materializing the concatenation.

Scale shape: packing runs WITHIN a shard (``partition_col``) — one
window-sort per shard, no global ordering bottleneck. That mirrors
production practice: corpora are packed per shard and shards are
consumed independently; a global concatenation order would serialize
the whole corpus through one task for no training benefit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    token_count_col: str = "n_tokens",
    id_col: str = "doc_id",
    partition_col: str = "source",
    sep_tokens: int = 1,
) -> DataFrame:
    """Assign each document its packed position within its shard.

    Returns the input's ``id_col``/``partition_col`` plus:
    ``tok_offset`` (tokens before this doc in the shard's stream,
    including ``sep_tokens`` after every earlier doc), ``chunk_id``
    (budget-sized chunk containing the doc's first token) and
    ``n_chunks`` (how many chunks the doc touches).
    """
    w = (
        W.partitionBy(partition_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tok = F.col(token_count_col).cast("long") + F.lit(sep_tokens)
    cum_incl = F.sum(tok).over(w)
    offset = (cum_incl - tok).alias("tok_offset")
    first_chunk = F.floor((cum_incl - tok) / budget)
    # last OWN token (exclusive of the trailing separator)
    last_tok = cum_incl - F.lit(sep_tokens) - 1
    last_chunk = F.floor(last_tok / budget)
    return df.select(
        id_col,
        partition_col,
        F.col(token_count_col),
        offset,
        first_chunk.cast("long").alias("chunk_id"),
        (last_chunk - first_chunk + 1).cast("long").alias("n_chunks"),
    )


def length_bucket_batches(
    df: DataFrame,
    bucket_width: int = 32,
    batch_size: int = 8,
    token_count_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch assembly — the padding-efficiency step for
    fine-tuning / eval pipelines that pad to the batch max instead of
    packing: group documents into ``bucket_width``-token length buckets,
    fill fixed-size batches within each bucket (longest-first, id
    tie-break), and report each batch's padding waste so the pipeline
    can audit the token overhead before committing GPU time.

    Returns one row per (bucket, batch_id): ``n_docs``, ``max_tok``,
    ``sum_tok``, and ``padding`` = n_docs * max_tok - sum_tok (tokens
    burned on pad). All-integer arithmetic — bit-reproducible anywhere.

    Scale shape: ONE window shuffle keyed by bucket plus the batch
    aggregation on the same key (no second shuffle — (bucket, batch_id)
    is bucket-prefixed). Bucket count is |max_len / bucket_width|, so
    windows stay narrow; a pathologically hot bucket is the same
    two-phase-top-N story as domain_cap and splits fine under AQE."""
    n_tok = F.col(token_count_col).cast("long")
    bucket = F.floor(n_tok / F.lit(bucket_width)).cast("long").alias("bucket")
    w = W.partitionBy("bucket").orderBy(F.col("n_tok").desc(), F.col(id_col).asc())
    batch = F.floor((F.row_number().over(w) - 1) / F.lit(batch_size))
    return (
        df.select(F.col(id_col), n_tok.alias("n_tok"), bucket)
        .withColumn("batch_id", batch.cast("long"))
        .groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("max_tok"),
            F.sum("n_tok").alias("sum_tok"),
        )
        .select(
            "bucket",
            "batch_id",
            "n_docs",
            "max_tok",
            "sum_tok",
            (F.col("n_docs") * F.col("max_tok") - F.col("sum_tok")).alias("padding"),
        )
    )
