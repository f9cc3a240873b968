"""Mechanical pins for the driver-gate window invariant
(__spark_entry__.py): the r06 verdict's process item #7 — the
invariant must hold by construction, not by per-round eyeballing.

The driver checks ~50-51 entries per round in queries() order. The
mandatory prefix (every §2A delta op, every events/streaming query,
one representative per §2B category, and every never-witnessed entry)
must fit inside the top 48 so no new operator ships without a driver
row and no plane loses its per-round witness.
"""

from __future__ import annotations

import importlib.util
import os

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(_HERE, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mandatory_prefix_fits_the_driver_window():
    e = _entry_module()
    names = list(e.queries().keys())
    top = set(names[:48])
    missing = [
        n
        for i, n in enumerate(names)
        if e._plane_rank(n) <= 3 and n not in top
    ]
    assert not missing, (
        f"mandatory-prefix entries pushed past position 48: {missing} — "
        "graduate older first-witness entries or trim representatives"
    )


def test_first_witness_intake_is_capped():
    e = _entry_module()
    # r06 verdict #7: ~14 is what the window absorbs after the fixed
    # prefix; a larger batch silently defers someone's first witness
    assert len(e._FIRST_WITNESS_NEEDED) <= 14
    # and every listed entry actually exists in the registry
    reg = set(e.registry())
    unknown = [n for n in e._FIRST_WITNESS_NEEDED if n not in reg]
    assert not unknown, unknown


def test_every_registry_entry_has_an_oracle():
    e = _entry_module()
    missing = [n for n in e.registry() if n not in e.oracle_sql()]
    assert not missing, (
        f"oracle-less entries: {missing} — the registry has been "
        "oracle-complete since r07 (streaming included); keep it that way"
    )
