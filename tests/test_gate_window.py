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


def test_max_staleness_is_bounded():
    """r08 (VERDICT r07 #2): re-witness latency must be an invariant,
    not arithmetic in a comment. With the current prefix size, the
    free slots per round must re-witness the whole rotated tail within
    a bounded number of rounds, and no already-green entry may
    currently be staler than that bound allows."""
    e = _entry_module()
    names = list(e.queries().keys())
    prefix = [n for n in names if e._plane_rank(n) <= 3]
    tail = [n for n in names if e._plane_rank(n) == 4]
    # driver window is 50-51; use the conservative 48 the prefix pin uses
    free_slots = 48 - len(prefix)
    assert free_slots >= 8, (
        f"prefix has grown to {len(prefix)}: only {free_slots} rotation "
        "slots left — graduate first-witness entries or trim the prefix"
    )
    bound = -(-len(tail) // free_slots)  # ceil
    # r10: the r09 intake block graduated, clone promoted to the pinned
    # prefix, and four same-operator delta variants joined the rotation
    # (each operator keeps a pinned sibling witness) — prefix back to
    # <=30, restoring the <=7 bound the r08 verdict asked for (r09 ran
    # at 10 during the intake peak; VERDICT r09 What's wrong #2).
    assert bound <= 7, (
        f"re-witness period ceil({len(tail)}/{free_slots}) = {bound} "
        "rounds — the tail outgrew the window; tighten the prefix"
    )
    # observed staleness: no green entry's last driver row may be older
    # than the bound (+1 round of grace for intake timing) behind the
    # newest round on record
    current = max(e._LAST_GREEN.values(), default=0)
    stale = {
        n: current - e._LAST_GREEN[n]
        for n in tail
        if n in e._LAST_GREEN and current - e._LAST_GREEN[n] > bound + 1
    }
    assert not stale, (
        f"entries staler than the {bound}-round re-witness bound: {stale}"
    )


def test_never_green_entries_lead_the_tail_inside_the_window():
    """r09 (restart): new gates may ride the never-green tail-front
    mechanism instead of _FIRST_WITNESS_NEEDED (the llm_mmr_rerank
    precedent) — but only if that mechanism actually places them inside
    the driver's window. Pin it: every registry entry with no green
    CORRECTNESS row in any recorded round must sort into the top 48."""
    e = _entry_module()
    names = list(e.queries().keys())
    never_green = [n for n in names if n not in e._LAST_GREEN]
    outside = [n for n in never_green if names.index(n) >= 48]
    assert not outside, (
        f"never-green entries outside the window: {outside} — the "
        "prefix + never-green block outgrew 48; graduate or pin"
    )
