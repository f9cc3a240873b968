"""SCD Type-2 dimension maintenance over a Delta table.

The canonical production MERGE composition (the shape the reference's
merge documentation and examples target — crates/core/src/operations/
merge/mod.rs; python/deltalake merge builder): a dimension table keeps
FULL HISTORY per business key as versioned rows
(key, attrs..., effective_from, effective_to, is_current); applying an
update batch must atomically

  1. CLOSE the current row of every key whose tracked attributes
     changed (set effective_to = batch version, is_current = false),
  2. INSERT a new current row for those keys, and
  3. INSERT a current row for brand-new keys,

all in ONE MERGE commit (OCC-safe; a concurrent writer conflicts
cleanly instead of interleaving half an update).

The one-merge trick is the staged-union source: each update row enters
once with its business key as the merge key (drives the close) and —
only when it actually changes an existing current row — a second time
with a NULL merge key (guaranteed non-match, drives the insert of the
new version). The merge condition uses a PLAIN equality on the merge
key, so NULL never matches anything.

Determinism contract: versions are caller-supplied integers (a commit
version, a batch id, an event-time watermark) — never wall-clock —
so runs replay exactly and the driver-gate oracle can reproduce the
final table in SQL.

Scale shape: one target read to compute change flags (broadcast-joined
when the batch is small — the common case), then one MERGE whose
partition pruning / IN-list machinery (operators/merge.py) bounds the
rewrite to files holding matched keys. Batch-sized work end-to-end;
history size only enters through the merge's own file pruning.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def apply_scd2(
    spark: SparkSession,
    dim_path: str,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    batch_version: int,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
    validate_unique_keys: bool = True,
) -> dict[str, Any]:
    """Apply one SCD2 update batch to the dimension at ``dim_path``.

    ``updates`` carries (key, *attrs) — at most one row per key (the
    caller resolves intra-batch conflicts). Duplicates are rejected
    up front with a ValueError (one batch-sized aggregate — this is a
    mutation op, already eager): the merge's own duplicate-match
    validation catches duplicates of EXISTING keys (two staged source
    rows match one current row -> MergeError), but a duplicated
    brand-new key never matches anything and would silently insert two
    "current" rows, so the explicit check is load-bearing, not belt
    and braces. ``validate_unique_keys=False`` skips it when the
    producer guarantees uniqueness (e.g. output of a groupBy).

    Concurrency: the staged-union MERGE reads the whole dimension (the
    merge condition is not partition-bounded). Under the DEFAULT
    WriteSerializable isolation a concurrent unrelated blind append is
    permitted — the merge detects the conflict, retries against the
    new snapshot, and both writes land (no lost update, pinned by
    tests/test_mutations.py::test_scd2_racing_unrelated_append_conflicts_cleanly).
    Callers that need appends serialized against dimension maintenance
    (an append racing the merge could add a key the merge just closed)
    must set ``delta.isolationLevel=Serializable`` on the table, under
    which the race raises ConcurrentAppendError cleanly with the
    dimension untouched and the batch re-appliable.

    NULL business keys are rejected: the staged-union MERGE reserves a
    NULL merge key for its forced-insert rows, so a NULL-keyed update
    can never match an existing row — each batch would silently insert
    ANOTHER "current" row for the untrackable key instead of versioning
    it (r10, NULL sweep).

    Returns the merge metrics dict."""
    from delta_rs_spark import DeltaTable

    checks = updates.agg(
        F.count(F.when(F.col(key).isNull(), 1)).alias("n_null"),
        (F.count(key) - F.countDistinct(key)).alias("n_dup"),
    ).first()
    if checks["n_null"]:
        raise ValueError(
            f"apply_scd2 update batch carries {checks['n_null']} NULL "
            f"{key!r} row(s); a NULL business key cannot be matched on "
            "later batches (and NULL is the staged forced-insert merge "
            "key), so it cannot be tracked as a dimension"
        )
    if validate_unique_keys and checks["n_dup"]:
        raise ValueError(
            f"apply_scd2 requires at most one update row per {key!r}; "
            "the batch contains duplicate keys"
        )

    dt = DeltaTable(dim_path, spark=spark)
    cur = dt.to_df(columns=[key, *attrs, current_col]).filter(
        F.col(current_col)
    )
    up = updates.select(key, *attrs)

    # change detection: null-safe inequality on any tracked attribute;
    # keys absent from the dimension are "new", not "changed"
    changed_pred = None
    for a in attrs:
        ne = ~F.col(f"u.{a}").eqNullSafe(F.col(f"c.{a}"))
        changed_pred = ne if changed_pred is None else (changed_pred | ne)
    flagged = (
        up.alias("u")
        .join(cur.alias("c"), F.col(f"u.{key}") == F.col(f"c.{key}"), "left")
        .select(
            F.col(f"u.{key}").alias(key),
            *[F.col(f"u.{a}").alias(a) for a in attrs],
            (F.col(f"c.{key}").isNotNull() & changed_pred).alias("__changed"),
        )
    )

    # staged-union source: every row once under its real merge key;
    # changed rows AGAIN under a NULL merge key (forced insert)
    with_mk = flagged.withColumn("__mk", F.col(key))
    null_mk = flagged.filter(F.col("__changed")).withColumn(
        "__mk", F.lit(None).cast(flagged.schema[key].dataType)
    )
    source = with_mk.unionByName(null_mk)

    m = (
        dt.merge(
            source,
            # PLAIN equality: a NULL __mk matches nothing by design
            f"t.{key} = s.__mk AND t.{current_col} = true",
            source_alias="s",
            target_alias="t",
        )
        .when_matched_update(
            {
                to_col: str(int(batch_version)),
                current_col: "false",
            },
            predicate="s.__changed",
        )
        .when_not_matched_insert(
            {
                key: f"s.{key}",
                **{a: f"s.{a}" for a in attrs},
                from_col: str(int(batch_version)),
                to_col: "NULL",
                current_col: "true",
            },
            # insert new-version rows (NULL __mk) and brand-new keys;
            # an unchanged existing key matched above and must not
            # insert — and its NULL-mk twin was never staged
            predicate="s.__mk IS NULL OR NOT s.__changed",
        )
        .execute()
    )
    return m
