"""Deletion-vector READ support (Delta protocol `deletionVectors` feature).

Implements the public Delta protocol's DV storage formats
(delta-io/delta PROTOCOL.md, "Deletion Vectors" + "Deletion Vector
Format"; descriptor model mirrored from reference
crates/core/src/kernel/models/actions.rs:883-912 — the reference's
actual decode lives in the delta-kernel crate, so everything here is
built from the protocol spec, not ported):

* descriptor ``storageType``: ``'i'`` inline (Z85-encoded bytes in the
  log), ``'u'`` relative file named ``deletion_vector_<uuid>.bin`` with
  an optional random prefix (uuid is Z85-encoded, fixed 20 chars),
  ``'p'`` absolute path.
* on-disk blob at ``offset``: ``<size: i32 BE><data><crc32(data): i32
  BE>`` inside a file whose first byte is the format version (1).
* ``data`` is a RoaringBitmapArray in "portable" form: magic 1681511377
  (i32 LE), number of 32-bit bitmaps (i64 LE), then per bitmap a key
  (i32 LE, the row-index high 32 bits) followed by a standard
  RoaringFormatSpec-serialized 32-bit roaring bitmap (array / bitmap /
  run containers all supported).

The encode helpers here are used by BOTH test fixtures and the write
path: DELETE/UPDATE/MERGE on ``delta.enableDeletionVectors=true``
tables produce descriptors via ``inline_dv_descriptor`` /
``write_dv_file`` (operators/delete.py ``dv_mark_rows``).
"""

from __future__ import annotations

import os
import struct
import uuid as uuid_mod
import zlib

MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # runs present and fewer containers: no offset header

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"Z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError(f"Z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out += reversed(chunk)
    return "".join(out)


# ---------------------------------------------------------------------------
# 32-bit roaring bitmap (RoaringFormatSpec) decode
# ---------------------------------------------------------------------------


def _decode_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one serialized 32-bit RoaringBitmap at data[pos:]; returns
    (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<I", data, pos)
    has_runs = (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN
    if has_runs:
        n = (cookie >> 16) + 1
        pos += 4
        run_flags = data[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        pos += 4
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        run_flags = b""
    else:
        raise ValueError(f"bad roaring cookie {cookie & 0xFFFF}")

    keys_cards = struct.unpack_from(f"<{2 * n}H", data, pos)
    pos += 4 * n
    if not has_runs or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset header (redundant for sequential decode)

    values: list[int] = []
    for i in range(n):
        key = keys_cards[2 * i]
        card = keys_cards[2 * i + 1] + 1
        base = key << 16
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", data, pos)
            pos += 4 * n_runs
            for r in range(n_runs):
                start, length = runs[2 * r], runs[2 * r + 1]
                values.extend(base + v for v in range(start, start + length + 1))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            arr = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base + v for v in arr)
    return values, pos


def decode_bitmap_array(data: bytes) -> list[int]:
    """Portable RoaringBitmapArray -> sorted 64-bit row indexes."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _decode_roaring32(data, pos)
        high = key << 32
        out.extend(high | v for v in vals)
    return sorted(out)


# ---------------------------------------------------------------------------
# 32-bit roaring bitmap encode (fixture/test support + future DV writes)
# ---------------------------------------------------------------------------


def _encode_roaring32(values: list[int], force: str | None = None) -> bytes:
    """Serialize sorted u32 values. ``force`` pins the container type
    ('array' | 'bitmap' | 'run') for format-coverage tests."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    n = len(by_key)
    containers: list[tuple[str, bytes]] = []
    for key, lows in sorted(by_key.items()):
        kind = force
        if kind is None or (kind == "bitmap" and len(lows) <= 4096):
            # readers infer array-vs-bitmap from cardinality, so a bitmap
            # container is only representable when card > 4096
            kind = "array" if len(lows) <= 4096 else "bitmap"
        if kind == "array":
            body = struct.pack(f"<{len(lows)}H", *lows)
        elif kind == "bitmap":
            words = [0] * 1024
            for v in lows:
                words[v >> 6] |= 1 << (v & 63)
            body = struct.pack("<1024Q", *words)
        else:  # run-length containers
            runs: list[tuple[int, int]] = []
            for v in lows:
                if runs and v == runs[-1][0] + runs[-1][1] + 1:
                    runs[-1] = (runs[-1][0], runs[-1][1] + 1)
                else:
                    runs.append((v, 0))
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, l) for s, l in runs
            )
        containers.append((kind, body))

    has_runs = any(k == "run" for k, _ in containers)
    out = bytearray()
    if has_runs:
        out += struct.pack("<I", _SERIAL_COOKIE_RUN | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i, (k, _) in enumerate(containers):
            if k == "run":
                flags[i // 8] |= 1 << (i % 8)
        out += flags
    else:
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for key, lows in sorted(by_key.items()):
        out += struct.pack("<HH", key, len(lows) - 1)
    if not has_runs or n >= _NO_OFFSET_THRESHOLD:
        off_base = len(out) + 4 * n
        offs = []
        run = off_base
        for _, body in containers:
            offs.append(run)
            run += len(body)
        out += struct.pack(f"<{n}I", *offs)
    for _, body in containers:
        out += body
    return bytes(out)


def encode_bitmap_array(row_indexes: list[int], force: str | None = None) -> bytes:
    by_high: dict[int, list[int]] = {}
    for ri in sorted(row_indexes):
        by_high.setdefault(ri >> 32, []).append(ri & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", MAGIC, len(by_high)))
    for high, vals in sorted(by_high.items()):
        out += struct.pack("<i", high)
        out += _encode_roaring32(vals, force)
    return bytes(out)


# ---------------------------------------------------------------------------
# Descriptor resolution
# ---------------------------------------------------------------------------


def _uuid_from_z85(s: str) -> str:
    return str(uuid_mod.UUID(bytes=z85_decode(s)))


def dv_file_path(table_path: str, path_or_inline: str) -> str:
    """'u' storage: ``<optional prefix><20-char z85 uuid>`` ->
    ``<table>/<prefix>/deletion_vector_<uuid>.bin``."""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    name = f"deletion_vector_{_uuid_from_z85(enc)}.bin"
    parts = [table_path]
    if prefix:
        parts.append(prefix)
    parts.append(name)
    return os.path.join(*parts)


def load_dv_row_indexes(table_path: str, descriptor: dict) -> list[int]:
    """Deleted row indexes for one Add's deletionVector descriptor.

    Decodes are memoized per (table, descriptor): a snapshot's DVs are
    immutable blobs, so repeated scans (to_df/count/delete in sequence)
    pay the roaring decode once, not per query. At genuinely large DV
    cardinalities the decode should move into tasks; the cache bounds
    the driver cost to one decode per distinct DV."""
    import json as _json

    key = (table_path, _json.dumps(descriptor, sort_keys=True))
    hit = _DV_CACHE.get(key)
    if hit is not None:
        return hit
    out = _load_dv_row_indexes_uncached(table_path, descriptor)
    if len(_DV_CACHE) > 64:
        _DV_CACHE.clear()
    _DV_CACHE[key] = out
    return out


_DV_CACHE: dict = {}


def _load_dv_row_indexes_uncached(table_path: str, descriptor: dict) -> list[int]:
    st = descriptor.get("storageType")
    payload = descriptor["pathOrInlineDv"]
    size = descriptor.get("sizeInBytes")
    if st == "i":
        data = z85_decode(payload)
        if size is not None:
            data = data[:size]  # z85 pads to 4-byte groups
        return decode_bitmap_array(data)
    if st == "u":
        path = dv_file_path(table_path, payload)
    elif st == "p":
        from delta_rs_spark.operators.util import resolve_add_path

        # bare absolute path (legacy) or percent-encoded file: URI (the
        # r10 clone spelling) — the scheme is the decode flag
        path = resolve_add_path(table_path, payload)
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    offset = descriptor.get("offset") or 1  # past the version byte
    with open(path, "rb") as f:
        f.seek(offset)
        (length,) = struct.unpack(">i", f.read(4))
        data = f.read(length)
        (crc,) = struct.unpack(">i", f.read(4))
    if size is not None and length != size:
        raise ValueError(f"DV size mismatch: file {length} != descriptor {size}")
    if crc != struct.unpack(">i", struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))[0]:
        raise ValueError(f"DV checksum mismatch in {path}")
    return decode_bitmap_array(data)


def write_dv_file(
    table_path: str, row_indexes: list[int], prefix: str = ""
) -> dict:
    """Write a protocol-shaped DV sidecar file; returns the 'u'
    descriptor. Used by dv_mark_rows for bitmaps above the inline
    threshold, and by tests to build fixture tables."""
    u = uuid_mod.uuid4()
    data = encode_bitmap_array(row_indexes)
    name = f"deletion_vector_{u}.bin"
    d = os.path.join(table_path, prefix) if prefix else table_path
    os.makedirs(d, exist_ok=True)
    offset = 1
    with open(os.path.join(d, name), "wb") as f:
        f.write(b"\x01")
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">i", struct.unpack(">i", struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))[0]))
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(row_indexes),
    }


def inline_dv_descriptor(row_indexes: list[int]) -> dict:
    data = encode_bitmap_array(row_indexes)
    padded = data + b"\x00" * (-len(data) % 4)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(data),
        "cardinality": len(row_indexes),
    }
