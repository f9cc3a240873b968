"""Shared helpers for table operators."""

from __future__ import annotations

import os
import re
import urllib.parse

from delta_rs_spark.log.actions import Add

_FILE_SCHEME_RE = re.compile(r"^file:/+")


def _rel_candidates(file_path: str, table_path: str) -> tuple[str, str]:
    """A Spark ``_metadata.file_path`` URI (``file:/...`` or
    ``file:///...``) as Add.path-style relative paths — both the raw and
    the URL-unquoted spelling (partition dirs may be stored encoded)."""
    p = _FILE_SCHEME_RE.sub("/", file_path)
    raw = os.path.relpath(p, table_path).replace(os.sep, "/")
    return raw, urllib.parse.unquote(raw)


def match_touched_files(
    touched_rows: list, table_path: str, candidates: list[Add]
) -> dict[str, int]:
    """Map (file_path, count) rows from a ``_metadata.file_path`` groupBy
    back to Add.path keys. Unmatched rows raise — a silent miss would
    turn a rewrite into data loss."""
    known = {a.path for a in candidates}
    out: dict[str, int] = {}
    for r in touched_rows:
        raw, unq = _rel_candidates(r["fp"], table_path)
        if raw in known:
            out[raw] = out.get(raw, 0) + int(r["count"])
        elif unq in known:
            out[unq] = out.get(unq, 0) + int(r["count"])
        else:
            raise RuntimeError(
                f"scanned file {r['fp']} not found among snapshot adds under {table_path}"
            )
    return out
