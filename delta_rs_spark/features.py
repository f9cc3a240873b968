"""Table feature enum mirroring the reference surface
(python/src/features.rs TableFeatures / _internal.pyi:35), with the
mapping to the Delta protocol's camelCase feature-name strings that the
Protocol action's readerFeatures/writerFeatures lists carry.
"""

from __future__ import annotations

from enum import Enum


class TableFeatures(Enum):
    ColumnMapping = "ColumnMapping"
    DeletionVectors = "DeletionVectors"
    TimestampWithoutTimezone = "TimestampWithoutTimezone"
    V2Checkpoint = "V2Checkpoint"
    AppendOnly = "AppendOnly"
    Invariants = "Invariants"
    CheckConstraints = "CheckConstraints"
    ChangeDataFeed = "ChangeDataFeed"
    GeneratedColumns = "GeneratedColumns"
    IdentityColumns = "IdentityColumns"
    RowTracking = "RowTracking"
    DomainMetadata = "DomainMetadata"
    IcebergCompatV1 = "IcebergCompatV1"
    VariantType = "VariantType"
    VariantTypePreview = "VariantTypePreview"
    ClusteredTable = "ClusteredTable"


# Delta protocol feature-name strings (PROTOCOL.md "Table Features")
_PROTOCOL_NAMES: dict[TableFeatures, str] = {
    TableFeatures.ColumnMapping: "columnMapping",
    TableFeatures.DeletionVectors: "deletionVectors",
    TableFeatures.TimestampWithoutTimezone: "timestampNtz",
    TableFeatures.V2Checkpoint: "v2Checkpoint",
    TableFeatures.AppendOnly: "appendOnly",
    TableFeatures.Invariants: "invariants",
    TableFeatures.CheckConstraints: "checkConstraints",
    TableFeatures.ChangeDataFeed: "changeDataFeed",
    TableFeatures.GeneratedColumns: "generatedColumns",
    TableFeatures.IdentityColumns: "identityColumns",
    TableFeatures.RowTracking: "rowTracking",
    TableFeatures.DomainMetadata: "domainMetadata",
    TableFeatures.IcebergCompatV1: "icebergCompatV1",
    TableFeatures.VariantType: "variantType",
    TableFeatures.VariantTypePreview: "variantType-preview",
    TableFeatures.ClusteredTable: "clusteredTable",
}


def protocol_feature_name(feature: "TableFeatures | str") -> str:
    """Enum member -> protocol string; raw strings pass through (assumed
    to already be protocol feature names)."""
    if isinstance(feature, TableFeatures):
        return _PROTOCOL_NAMES[feature]
    return str(feature)


# Protocol feature kinds: reader-writer features appear in BOTH
# readerFeatures and writerFeatures; everything else is writer-only
# (PROTOCOL.md; kernel's ReaderWriterFeature vs WriterFeature split).
READER_WRITER_FEATURES: frozenset[str] = frozenset(
    {
        "columnMapping",
        "deletionVectors",
        "timestampNtz",
        "v2Checkpoint",
        "variantType",
        "variantType-preview",
    }
)


def required_protocol(schema_json: str, configuration: dict | None):
    """Protocol action implied by a create's schema + configuration
    (reference create.rs derives required features the same way):
    variant columns, deletion vectors, column mapping, and CDF each
    demand their table feature; reader-writer features land in both
    lists, writer-only ones in writerFeatures alone."""
    from delta_rs_spark.log.actions import Protocol

    cfg = configuration or {}
    feats: set[str] = set()
    if '"variant"' in schema_json:
        feats.add("variantType")
    if '"delta.identity.' in schema_json:
        feats.add("identityColumns")
    if cfg.get("delta.enableDeletionVectors", "").lower() == "true":
        feats.add("deletionVectors")
    if cfg.get("delta.columnMapping.mode", "none") != "none":
        feats.add("columnMapping")
    if cfg.get("delta.enableChangeDataFeed", "").lower() == "true":
        feats.add("changeDataFeed")
    if cfg.get("delta.enableInCommitTimestamps", "").lower() == "true":
        feats.add("inCommitTimestamp")
    if cfg.get("delta.enableRowTracking", "").lower() == "true":
        # the high watermark lives in a delta.rowTracking domainMetadata
        # action, so enabling row tracking demands both features
        feats.add("rowTracking")
        feats.add("domainMetadata")
    if not feats:
        return Protocol()
    reader = sorted(feats & READER_WRITER_FEATURES)
    return Protocol(
        min_reader_version=3 if reader else 1,
        min_writer_version=7,
        reader_features=reader or None,
        writer_features=sorted(feats),
    )
