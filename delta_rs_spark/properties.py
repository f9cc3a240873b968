"""Writer / commit / post-commit property mirror classes.

API parity with the reference's configuration surface
(reference: python/deltalake/writer/properties.py:8-230,
python/deltalake/transaction.py:26-77). The reference forwards these to
its Rust parquet writer and commit builder; here the honored subset maps
onto Spark parquet writer options and our commit loop:

* ``WriterProperties.compression`` / ``compression_level`` -> the Spark
  ``compression`` write option (+ codec level options where parquet-mr
  exposes them: zstd, gzip).
* ``data_page_size_limit`` / ``dictionary_page_size_limit`` ->
  ``parquet.page.size`` / ``parquet.dictionary.page.size``.
* ``max_row_group_size`` is ROWS in the reference; parquet-mr only
  bounds row groups by bytes (``parquet.block.size``), so it is
  approximated as rows * 64 bytes with a documented floor — callers that
  need exact row-group rows should size via ``target_file_size``.
* Column-level properties (encodings, bloom filters) have no Spark
  parquet-writer surface and are carried for API compatibility only.

``CommitProperties.custom_metadata`` lands in the commit's
``commitInfo`` (the ``userMetadata`` key is promoted to the protocol's
string field, other keys are merged verbatim, generated keys are
rejected — reference kernel/transaction/mod.rs:134,:356).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

_SPARK_CODECS = {
    "UNCOMPRESSED": "uncompressed",
    "SNAPPY": "snappy",
    "GZIP": "gzip",
    "BROTLI": "brotli",
    "LZ4": "lz4",
    "ZSTD": "zstd",
    "LZ4_RAW": "lz4_raw",
}

#: keys the engine generates; custom_metadata may not override them
#: (reference transaction/mod.rs promote_* reserved handling)
_GENERATED_COMMIT_KEYS = {"timestamp", "operation", "engineInfo"}


@dataclass
class BloomFilterProperties:
    """Bloom filter settings (carried for API parity; Spark's parquet
    writer exposes no per-column bloom filter toggle)."""

    set_bloom_filter_enabled: bool | None = None
    fpp: float | None = None
    ndv: int | None = None

    def __post_init__(self) -> None:
        if self.fpp is not None and not (0 < self.fpp < 1):
            raise ValueError("fpp must be between 0 and 1 exclusive")


@dataclass
class ColumnProperties:
    """Per-column parquet writer settings (API parity carrier)."""

    dictionary_enabled: bool | None = None
    statistics_enabled: str | None = None
    bloom_filter_properties: BloomFilterProperties | None = None


@dataclass
class WriterProperties:
    """Parquet writer configuration (reference writer/properties.py:157)."""

    data_page_size_limit: int | None = None
    dictionary_page_size_limit: int | None = None
    data_page_row_count_limit: int | None = None
    write_batch_size: int | None = None
    max_row_group_size: int | None = None
    compression: str | None = None
    compression_level: int | None = None
    statistics_truncate_length: int | None = None
    default_column_properties: ColumnProperties | None = None
    column_properties: dict[str, ColumnProperties] | None = None

    def __post_init__(self) -> None:
        if self.compression is not None:
            codec = self.compression.upper()
            if codec not in _SPARK_CODECS:
                raise ValueError(
                    f"{self.compression} is not a valid Compression; valid: "
                    f"{sorted(_SPARK_CODECS)}"
                )
            self.compression = codec

    def spark_write_options(self) -> dict[str, str]:
        """The honored subset as Spark DataFrameWriter options."""
        opts: dict[str, str] = {}
        if self.compression:
            opts["compression"] = _SPARK_CODECS[self.compression]
        if self.compression_level is not None:
            if self.compression == "ZSTD":
                opts["parquet.compression.codec.zstd.level"] = str(self.compression_level)
            elif self.compression == "GZIP":
                opts["zlib.compress.level"] = str(self.compression_level)
        if self.data_page_size_limit is not None:
            opts["parquet.page.size"] = str(self.data_page_size_limit)
        if self.dictionary_page_size_limit is not None:
            opts["parquet.dictionary.page.size"] = str(self.dictionary_page_size_limit)
        if self.data_page_row_count_limit is not None:
            opts["parquet.page.row.count.limit"] = str(self.data_page_row_count_limit)
        if self.max_row_group_size is not None:
            # parquet-mr bounds row groups by BYTES; approximate assuming
            # >= 64 B/row so the group never holds more rows than asked
            opts["parquet.block.size"] = str(max(self.max_row_group_size * 64, 1 << 20))
        return opts


@dataclass
class PostCommitHookProperties:
    """Post-commit hook controls (reference transaction.py:26-45)."""

    create_checkpoint: bool = True
    cleanup_expired_logs: bool | None = None


@dataclass
class Transaction:
    """App-id idempotency watermark (reference _internal.pyi:1075
    Transaction): pass in ``CommitProperties.app_transactions`` to
    record it atomically with a commit."""

    app_id: str
    version: int
    last_updated: int | None = None


@dataclass
class CommitProperties:
    """Commit behaviour controls (reference transaction.py:48-77).

    ``app_transactions`` entries are (app_id, version) tuples or
    ``Transaction`` objects — idempotency watermarks appended to the
    commit as ``txn`` actions.
    """

    custom_metadata: dict[str, Any] | None = None
    max_commit_retries: int | None = None
    app_transactions: list[tuple[str, int] | Transaction] | None = None

    def __post_init__(self) -> None:
        if self.custom_metadata is not None:
            # reserved-key validation parity with the reference
            # (test_commit_properties.py): generated keys can never be
            # overridden; typed reserved keys must carry the right JSON
            # shape; everything must be JSON-serializable (no NaN/Inf)
            if not isinstance(self.custom_metadata, dict):
                raise ValueError(
                    "custom_metadata must be a mapping of string keys"
                )
            if any(not isinstance(k, str) for k in self.custom_metadata):
                raise ValueError("custom_metadata keys must be strings")
            bad = _GENERATED_COMMIT_KEYS & set(self.custom_metadata)
            if bad:
                raise ValueError(
                    f"custom_metadata may not set generated keys: {sorted(bad)}"
                )
            op = self.custom_metadata.get("operationParameters")
            if op is not None and not isinstance(op, dict):
                raise ValueError(
                    "custom_metadata operationParameters must be a JSON object"
                )
            rv = self.custom_metadata.get("readVersion")
            if rv is not None and (
                not isinstance(rv, int) or isinstance(rv, bool) or rv < 0
            ):
                raise ValueError(
                    "custom_metadata readVersion must be a non-negative integer"
                )
            il = self.custom_metadata.get("isolationLevel")
            if il is not None and il not in (
                "Serializable",
                "WriteSerializable",
                "SnapshotIsolation",
            ):
                raise ValueError(
                    f"custom_metadata isolationLevel {il!r} is not a valid "
                    "isolation level"
                )
            un = self.custom_metadata.get("userName")
            if un is not None and not isinstance(un, str):
                raise ValueError("custom_metadata userName must be a string")
            import json as _json

            try:
                _json.dumps(self.custom_metadata, allow_nan=False)
            except (TypeError, ValueError) as e:
                raise ValueError(
                    f"custom_metadata must be JSON-serializable: {e}"
                ) from e
