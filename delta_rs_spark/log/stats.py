"""Per-file statistics from parquet footers.

Mirrors the reference's write-time stats collection
(reference: crates/core/src/writer/stats.rs:82-543): numRecords,
per-column min/max/nullCount for the first ``delta.dataSkippingNumIndexedCols``
(default 32) leaf columns — read from parquet row-group metadata only
(no data pages touched), so cost is O(footer) not O(file).
"""

from __future__ import annotations

import base64
import datetime as dt
import decimal
import json
import math
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_NUM_INDEXED_COLS = 32


def _scalar(v: Any) -> Any:
    """JSON-encode a parquet statistics scalar the way Delta stats do."""
    if v is None:
        return None
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return base64.b64encode(v).decode("ascii")
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    if isinstance(v, decimal.Decimal):
        # the reference stores decimal stats as f64
        # (writer/stats.rs StatsScalar::Decimal)
        return float(v)
    return v


def _decimal_min_max(st) -> tuple[Any, Any] | None:
    """Decode decimal min/max from RAW physical stats. pyarrow's
    Statistics.min/max raise ArrowNotImplementedError for INT32/INT64
    -backed decimals (Spark's layout for precision <= 18); the raw
    values are the unscaled integers (or big-endian two's-complement
    bytes for FIXED_LEN_BYTE_ARRAY), so scale them ourselves."""
    lt = st.logical_type
    if lt is None or lt.type != "DECIMAL":
        return None
    try:
        scale = json.loads(lt.to_json())["scale"]
    except (ValueError, KeyError, TypeError):
        return None

    def _dec(raw: Any) -> decimal.Decimal | None:
        if raw is None:
            return None
        if isinstance(raw, bytes):
            raw = int.from_bytes(raw, "big", signed=True)
        return decimal.Decimal(raw).scaleb(-scale)

    return _dec(st.min_raw), _dec(st.max_raw)


def collect_file_stats(
    file_path: str,
    num_indexed_cols: int = DEFAULT_NUM_INDEXED_COLS,
    stats_columns: list[str] | None = None,
) -> dict[str, Any]:
    """Aggregate row-group statistics of one parquet file into Delta stats.

    ``stats_columns`` (delta.dataSkippingStatsColumns) selects columns by
    NAME and overrides the positional first-N rule; ``num_indexed_cols``
    < 0 means all columns (delta.dataSkippingNumIndexedCols=-1).

    Returns None when the footer is unreadable by pyarrow — e.g. files
    carrying the VARIANT logical type, which pyarrow 16 does not know.
    Callers with a SparkSession fall back to a scan-side stats job
    (writer._spark_stats_fallback); others store the Add without stats."""
    try:
        md = pq.ParquetFile(file_path).metadata
    except (OSError, NotImplementedError, pa.ArrowException):
        # pyarrow raises ArrowInvalid (ValueError) or
        # ArrowNotImplementedError for foreign/unparseable footers, not
        # just OSError — convert_to_deltalake tolerates these as
        # stats=None the same way
        return None
    ncols = md.num_columns
    if stats_columns is not None or num_indexed_cols < 0:
        admit = [True] * ncols
    else:
        # the delta.dataSkippingNumIndexedCols budget is consumed by
        # distinct TOP-LEVEL fields, not parquet leaves (reference
        # writer/stats.rs:168-195 and its #3172 regression test): one
        # nested column with many leaves takes ONE slot, so later
        # top-level columns are not starved of stats
        admit = []
        admitted_tops: set[str] = set()
        for ci in range(ncols):
            top = md.schema.column(ci).path.split(".")[0]
            if top not in admitted_tops:
                if len(admitted_tops) >= num_indexed_cols:
                    admit.append(False)
                    continue
                admitted_tops.add(top)
            admit.append(True)
    selected = set(stats_columns) if stats_columns is not None else None
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    have_stats = list(admit)
    for rg in range(md.num_row_groups):
        for ci in range(ncols):
            if not admit[ci]:
                continue
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaves: skip (top-level cols only)
                have_stats[ci] = False
                continue
            if selected is not None and name not in selected:
                have_stats[ci] = False
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                have_stats[ci] = False
                continue
            try:
                mn, mx = st.min, st.max
            except (NotImplementedError, pa.ArrowNotImplementedError):
                dec = _decimal_min_max(st)
                if dec is None:
                    have_stats[ci] = False
                    continue
                mn, mx = dec
            if name not in mins or (mn is not None and mins[name] is not None and mn < mins[name]):
                mins[name] = mn
            if name not in maxs or (mx is not None and maxs[name] is not None and mx > maxs[name]):
                maxs[name] = mx
            nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
    for ci in range(ncols):
        if not have_stats[ci]:
            name = md.row_group(0).column(ci).path_in_schema if md.num_row_groups else None
            if name:
                mins.pop(name, None)
                maxs.pop(name, None)
                nulls.pop(name, None)  # partial counts would under-report
    return {
        "numRecords": md.num_rows,
        "minValues": {k: _scalar(v) for k, v in mins.items() if v is not None},
        "maxValues": {k: _scalar(v) for k, v in maxs.items() if v is not None},
        "nullCount": nulls,
    }


def collect_stats_parallel(
    paths: list[str],
    num_indexed_cols: int = DEFAULT_NUM_INDEXED_COLS,
    stats_columns: list[str] | None = None,
) -> list[dict[str, Any]]:
    if not paths:
        return []
    workers = min(16, max(1, len(paths)), os.cpu_count() or 4)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(
            ex.map(
                lambda p: collect_file_stats(p, num_indexed_cols, stats_columns),
                paths,
            )
        )


def stats_config(configuration: dict[str, str] | None) -> tuple[int, list[str] | None]:
    """Resolve the two data-skipping stats knobs from table config
    (reference table/config.rs: delta.dataSkippingNumIndexedCols,
    delta.dataSkippingStatsColumns)."""
    cfg = configuration or {}
    try:
        n = int(cfg.get("delta.dataSkippingNumIndexedCols", DEFAULT_NUM_INDEXED_COLS))
    except ValueError:
        n = DEFAULT_NUM_INDEXED_COLS
    raw = cfg.get("delta.dataSkippingStatsColumns")
    cols = None
    if raw:
        cols = [c.strip().strip("`") for c in raw.split(",") if c.strip()]
    return n, cols


def stats_json(stats: dict[str, Any]) -> str:
    return json.dumps(stats, separators=(",", ":"), default=str)
