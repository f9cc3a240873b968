"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming engine (its closest surface is CDF
incremental pulls); these operators are the Spark-superset answer for
the LLM-pipeline plane running LIVE: exact dedup and first-seen
tracking across micro-batches with managed, checkpointed state.

State is per-key and partitioned by Spark's shuffle, so the operator
scales horizontally: 100 TB of history becomes per-key state of a few
bytes (a seen flag / count), not a growing cache on any single node.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dedup_stream(
    stream_df: DataFrame,
    key_col: str = "fingerprint",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST row ever seen for each
    key, across all micro-batches (state: one boolean per key).

    Batch replay equivalence: ``dedup_exact`` over the accumulated data
    keeps one representative per fingerprint; this is the streaming
    front of the same contract (arrival order decides the survivor).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream_df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    cols = [f.name for f in out_schema.fields]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain; duplicates of an already-seen key
                pass
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[:1]
        state.update((True,))
        if first is not None:
            yield first[cols]

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        getattr(GroupStateTimeout, timeout),
    )


def running_counts_stream(
    stream_df: DataFrame,
    key_col: str,
    count_col: str = "n_seen",
) -> DataFrame:
    """Per-key running occurrence count emitted every micro-batch the key
    appears in (state: one long per key) — the building block for
    duplicate-frequency monitoring on an ingest stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream_df.schema[key_col]
    out_schema = T.StructType([key_field, T.StructField(count_col, T.LongType())])
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
        n += batch_n
        state.update((n,))
        if batch_n:
            yield pd.DataFrame({key_col: [key[0]], count_col: [n]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
