"""Shared helpers for table operators."""

from __future__ import annotations

import os
import re
import urllib.parse

from delta_rs_spark.log.actions import Add

_FILE_SCHEME_RE = re.compile(r"^file:/+")


def _rel_candidates(
    file_path: str, table_path: str
) -> tuple[str, str, str, str]:
    """A Spark ``_metadata.file_path`` URI (``file:/...`` or
    ``file:///...``) as Add.path-style keys: the relative raw and
    URL-unquoted spellings (partition dirs may be stored encoded), plus
    the ABSOLUTE spellings — a shallow clone's adds reference source
    files by absolute path (PROTOCOL.md allows it), and relpath against
    the clone root would never match them."""
    p = _FILE_SCHEME_RE.sub("/", file_path)
    raw = os.path.relpath(p, table_path).replace(os.sep, "/")
    return raw, urllib.parse.unquote(raw), p, urllib.parse.unquote(p)


def match_touched_files(
    touched_rows: list, table_path: str, candidates: list[Add]
) -> dict[str, int]:
    """Map (file_path, count) rows from a ``_metadata.file_path`` groupBy
    back to Add.path keys. Unmatched rows raise — a silent miss would
    turn a rewrite into data loss."""
    known = {a.path for a in candidates}
    out: dict[str, int] = {}
    for r in touched_rows:
        for cand in _rel_candidates(r["fp"], table_path):
            if cand in known:
                out[cand] = out.get(cand, 0) + int(r["count"])
                break
        else:
            raise RuntimeError(
                f"scanned file {r['fp']} not found among snapshot adds under {table_path}"
            )
    return out
