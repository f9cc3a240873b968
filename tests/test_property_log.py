"""Property-based tests (hypothesis) for the pure-Python layers.

The reference has no randomized testing (SURVEY §5); these go beyond it:
file-skipping soundness (a file containing a matching row is NEVER
pruned) and action JSON round-tripping hold for arbitrary inputs.
No SparkSession needed — pure log/plan layer.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from delta_rs_spark.log.actions import (
    Add,
    CommitInfo,
    Metadata,
    Protocol,
    Remove,
    Txn,
    action_to_line,
    parse_action,
)
from delta_rs_spark.plans.skipping import parse_conjuncts, prune_files

# ---------------------------------------------------------------------------
# Skipping soundness: prune_files must keep any file whose [min,max]
# interval contains a matching value.
# ---------------------------------------------------------------------------

_vals = st.integers(min_value=-1000, max_value=1000)


def _add_for(rows: list[int]) -> Add:
    stats = {
        "numRecords": len(rows),
        "minValues": {"x": min(rows)},
        "maxValues": {"x": max(rows)},
        "nullCount": {"x": 0},
    }
    return Add(
        path=f"f{hash(tuple(rows)) & 0xFFFF}.parquet",
        size=1,
        modification_time=0,
        stats=json.dumps(stats),
    )


def _matches(v: int, op: str, lit: int) -> bool:
    return {
        "=": v == lit,
        "<": v < lit,
        "<=": v <= lit,
        ">": v > lit,
        ">=": v >= lit,
        "!=": v != lit,
    }[op]


@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(_vals, min_size=1, max_size=20),
    op=st.sampled_from(["=", "<", "<=", ">", ">=", "!="]),
    lit=_vals,
)
def test_skipping_never_prunes_matching_file(rows, op, lit):
    add = _add_for(rows)
    pred = f"x {op} {lit}"
    kept = prune_files([add], pred, [])
    has_match = any(_matches(v, op, lit) for v in rows)
    if has_match:
        assert kept, f"pruned a file containing a match: {pred} rows={rows}"


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(_vals, min_size=1, max_size=20),
    lo=_vals,
    hi=_vals,
)
def test_skipping_between_sound(rows, lo, hi):
    add = _add_for(rows)
    kept = prune_files([add], f"x BETWEEN {lo} AND {hi}", [])
    if any(lo <= v <= hi for v in rows):
        assert kept


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(_vals, min_size=1, max_size=20), lits=st.lists(_vals, min_size=1, max_size=5))
def test_skipping_in_sound(rows, lits):
    add = _add_for(rows)
    pred = f"x IN ({', '.join(map(str, lits))})"
    kept = prune_files([add], pred, [])
    if set(rows) & set(lits):
        assert kept


@settings(max_examples=100, deadline=None)
@given(garbage=st.text(min_size=1, max_size=60))
def test_unparseable_predicates_never_prune(garbage):
    """Anything the conjunct parser can't handle must fall back to keep-all."""
    add = _add_for([1, 2, 3])
    pred = f"some_udf({garbage!r}) > 0"
    try:
        conj = parse_conjuncts(pred)
    except Exception:
        conj = None
    kept = prune_files([add], pred, []) if conj is not None else [add]
    assert kept  # conservative: never lose the file


# ---------------------------------------------------------------------------
# Action JSON round-trips for arbitrary field content
# ---------------------------------------------------------------------------

_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(
    path=_name,
    size=st.integers(min_value=0, max_value=2**40),
    ts=st.integers(min_value=0, max_value=2**45),
    pv=st.dictionaries(_name, st.one_of(st.none(), _name), max_size=4),
)
def test_add_remove_roundtrip(path, size, ts, pv):
    add = Add(path=path, size=size, modification_time=ts, partition_values=pv)
    back = parse_action(action_to_line(add))
    assert isinstance(back, Add)
    assert (back.path, back.size, back.partition_values) == (path, size, pv)
    rm = Remove(path=path, deletion_timestamp=ts, partition_values=pv, size=size)
    back = parse_action(action_to_line(rm))
    assert isinstance(back, Remove)
    assert back.path == path and back.deletion_timestamp == ts


@settings(max_examples=100, deadline=None)
@given(app=_name, version=st.integers(min_value=0, max_value=2**31))
def test_txn_roundtrip(app, version):
    back = parse_action(action_to_line(Txn(app, version)))
    assert isinstance(back, Txn)
    assert (back.app_id, back.version) == (app, version)


@settings(max_examples=100, deadline=None)
@given(
    cfg=st.dictionaries(_name, _name, max_size=5),
    parts=st.lists(_name, max_size=3, unique=True),
)
def test_metadata_roundtrip(cfg, parts):
    m = Metadata(schema_string="{}", partition_columns=parts, configuration=cfg)
    back = parse_action(action_to_line(m))
    assert isinstance(back, Metadata)
    assert back.configuration == cfg and back.partition_columns == parts


# ---------------------------------------------------------------------------
# Deletion-vector roaring codec: encode/decode is the identity on any
# row-index set (the write path now PRODUCES these bitmaps, so codec
# corruption would silently resurrect or lose rows)
# ---------------------------------------------------------------------------

_ri = st.one_of(
    st.integers(min_value=0, max_value=1 << 20),          # dense low range
    st.integers(min_value=0, max_value=(1 << 33)),        # crosses 32-bit keys
    st.builds(lambda k, lo: (k << 16) + lo,               # container edges
              st.integers(0, 8), st.sampled_from([0, 1, 4095, 4096, 65535])),
)


@settings(max_examples=200, deadline=None)
@given(rows=st.sets(_ri, min_size=0, max_size=300))
def test_dv_bitmap_round_trip_property(rows):
    from delta_rs_spark.plans.deletion_vectors import (
        decode_bitmap_array,
        encode_bitmap_array,
    )

    if not rows:
        return
    assert decode_bitmap_array(encode_bitmap_array(sorted(rows))) == sorted(rows)


@settings(max_examples=100, deadline=None)
@given(rows=st.sets(st.integers(0, 1 << 20), min_size=1, max_size=200))
def test_dv_inline_descriptor_round_trip_property(rows):
    from delta_rs_spark.plans.deletion_vectors import (
        decode_bitmap_array,
        inline_dv_descriptor,
        z85_decode,
    )

    d = inline_dv_descriptor(sorted(rows))
    data = z85_decode(d["pathOrInlineDv"])[: d["sizeInBytes"]]
    assert decode_bitmap_array(data) == sorted(rows)
    assert d["cardinality"] == len(rows)


# ---------------------------------------------------------------------------
# Column-mapped skipping soundness: the same guarantee when stats and
# partitionValues are keyed by PHYSICAL names (the r05 operator-pruning
# bug class: a missing physical_of map silently pruned EVERY file on
# partition-column predicates).
# ---------------------------------------------------------------------------


def _mapped_add_for(rows: list[int], part: int | None = None) -> Add:
    stats = {
        "numRecords": len(rows),
        "minValues": {"col-x9": min(rows)},
        "maxValues": {"col-x9": max(rows)},
        "nullCount": {"col-x9": 0},
    }
    return Add(
        path=f"m{hash((tuple(rows), part)) & 0xFFFF}.parquet",
        size=1,
        modification_time=0,
        stats=json.dumps(stats),
        partition_values={} if part is None else {"col-p7": str(part)},
    )


_PHYS = {"x": "col-x9", "p": "col-p7"}


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(_vals, min_size=1, max_size=20),
    op=st.sampled_from(["=", "<", "<=", ">", ">=", "!="]),
    lit=_vals,
)
def test_mapped_skipping_never_prunes_matching_file(rows, op, lit):
    add = _mapped_add_for(rows)
    kept = prune_files(
        [add], f"x {op} {lit}", [], {"x": "long"}, physical_of=_PHYS
    )
    if any(_matches(v, op, lit) for v in rows):
        assert kept, f"pruned matching mapped file: x {op} {lit} rows={rows}"


@settings(max_examples=200, deadline=None)
@given(
    part=st.integers(min_value=0, max_value=5),
    lit=st.integers(min_value=0, max_value=5),
    op=st.sampled_from(["=", "<", "<=", ">", ">=", "!="]),
)
def test_mapped_partition_pruning_exact(part, lit, op):
    """Partition-only predicates must prune EXACTLY (both directions) on
    mapped tables — this is metadata-only DELETE's correctness."""
    add = _mapped_add_for([0], part=part)
    kept = prune_files(
        [add], f"p {op} {lit}", ["p"], {"p": "long"}, physical_of=_PHYS
    )
    assert bool(kept) == _matches(part, op, lit)
