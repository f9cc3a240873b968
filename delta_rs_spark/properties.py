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
        if self.custom_metadata:
            bad = _GENERATED_COMMIT_KEYS & set(self.custom_metadata)
            if bad:
                raise ValueError(
                    f"custom_metadata may not set generated keys: {sorted(bad)}"
                )
            for k, v in self.custom_metadata.items():
                if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
                    raise ValueError(f"custom_metadata[{k!r}]: NaN/Infinity rejected")
