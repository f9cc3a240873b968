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


def dedup_within_watermark(
    stream_df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    delay: str,
) -> DataFrame:
    """Bounded-state streaming dedup: emit the first row seen per key,
    but keep the key's state only for ``delay`` of event time — the
    production shape when duplicates cluster in time (retries, replays)
    and unbounded key state (``dedup_stream``) would grow with corpus
    history. Built on the engine's ``dropDuplicatesWithinWatermark``.

    Engine semantics the gate + tests pin (probed on this build,
    tests/test_streaming.py::test_dedup_within_watermark_rules):
     - input rows with event time <= the LAGGED watermark (the one in
       effect one batch earlier, SPARK-24634) are dropped before the
       state lookup — non-strict compare;
     - an admitted row is emitted iff its key is absent from state;
       emission stores expiry = event_time + delay. Duplicates do NOT
       extend the expiry, and the expiry check happens only at
       end-of-batch eviction — a duplicate arriving in the batch whose
       watermark already passed the key's expiry is still dropped;
     - end of batch k evicts keys with expiry <= the batch's watermark
       (non-strict); a key re-arriving after eviction RE-EMITS.

    At 100 TB rates state is O(keys per delay window) per partition,
    not O(all keys ever) — the whole point vs. dedup_stream.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return stream_df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_list
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
