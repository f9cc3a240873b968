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
