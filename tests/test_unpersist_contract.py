"""VERDICT r12 #6: operator-plane gates must not leak cached blocks.

Mutation operators and the index-sync gates persist bounded
intermediates (change batches, join frames) and release them in
``finally``; this test runs every delta_* gate plus the commit-sequence
sync gates sequentially at sf0.001 and asserts the session holds ZERO
persistent RDDs after each one's result is fully consumed.

Library-level ANALYTIC functions (classifier_auc, value_percentiles,
source_mix, retrieval postings, ...) are deliberately out of scope:
their pins are plan-participating and caller-owned (documented in the
docstrings; ``session.drop_cached_intermediates`` is the release hook,
which bench.py calls between samples) — a gate cannot unpersist a block
its returned plan still reads. The last assertion pins that
drop_cached_intermediates really clears whatever those leave behind.
"""

from __future__ import annotations

import pytest

# sf0.01, not sf0.001: several delta gates carry in-gate assertions
# whose fixed key ranges select no rows at the smallest SF
SF_DIR = "/root/testdata/sf0.01"

_SYNC_GATES = (
    "llm_fp_index_sync",
    "llm_fp_index_sync_nocdf",
    "llm_band_index_sync",
    "llm_ivf_index_sync",
    "llm_ivf_recluster",
    "llm_incremental_agg_nocdf",
)


def _persistent_rdd_count(spark) -> int:
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    n = 0
    while it.hasNext():
        it.next()
        n += 1
    return n


def test_operator_gates_leave_no_persistent_rdds(spark):
    import __spark_entry__ as entry
    from delta_rs_spark.session import drop_cached_intermediates

    qs = entry.queries()
    names = [n for n in qs if n.startswith("delta_")] + [
        n for n in _SYNC_GATES if n in qs
    ]
    assert len(names) >= 30  # the whole operator plane, not a sample

    drop_cached_intermediates(spark)
    leaks: dict[str, int] = {}
    for name in names:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        left = _persistent_rdd_count(spark)
        if left:
            leaks[name] = left
            drop_cached_intermediates(spark)  # isolate per-gate attribution
    assert not leaks, f"gates left persistent RDDs behind: {leaks}"


def test_drop_cached_intermediates_releases_analytic_pins(spark):
    import __spark_entry__ as entry
    from delta_rs_spark.session import drop_cached_intermediates

    qs = entry.queries()
    # classifier_auc pins its feature/grid frames into the returned plan
    name = "llm_classifier_auc"
    if name not in qs:
        pytest.skip("gate not registered")
    qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    assert _persistent_rdd_count(spark) > 0  # the documented caller-owned pin
    drop_cached_intermediates(spark)
    assert _persistent_rdd_count(spark) == 0
