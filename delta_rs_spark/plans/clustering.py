"""Clustered tables (delta-spark "liquid clustering"; Delta PROTOCOL.md
"Clustered Table").

The reference recognizes the surface — `clusteredTable` is an accepted
writer feature (kernel/models/actions.rs:799) and its protocol tests
parse the clustering domain metadata (protocol/mod.rs:717) — but, like
identity and clone, never implements maintenance; this plane is
delta-spark parity.

Protocol shape:

* writer feature ``clusteredTable`` (depends on ``domainMetadata``);
* the clustering columns live in a ``delta.clustering`` domain-metadata
  action whose configuration is ``{"clusteringColumns": [[...], ...]}``
  — each inner list a PHYSICAL-name path (delta-spark stores physical
  names so the spec survives column renames under mapping);
* files written BY a clustering OPTIMIZE carry
  ``clusteringProvider: "liquid"`` on their add action; plain appends
  leave it absent (new data is unclustered until the next OPTIMIZE —
  exactly the incremental-ZCube maintenance shape
  ``optimize.z_order(incremental=True)`` already implements);
* clustering columns and partition columns are mutually exclusive
  (delta-spark refuses CLUSTER BY on a partitioned table).
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

DOMAIN = "delta.clustering"
FEATURE = "clusteredTable"
PROVIDER = "liquid"
MAX_CLUSTERING_COLUMNS = 4  # delta-spark's limit


def validate_cluster_by(
    cluster_by: list[str],
    schema: T.StructType,
    partition_by: list[str] | None,
) -> None:
    from delta_rs_spark.log.commit import DeltaError

    if not cluster_by:
        raise DeltaError("cluster_by requires at least one column")
    if len(cluster_by) > MAX_CLUSTERING_COLUMNS:
        raise DeltaError(
            f"cluster_by supports at most {MAX_CLUSTERING_COLUMNS} columns "
            f"(delta-spark limit); got {len(cluster_by)}"
        )
    if partition_by:
        raise DeltaError(
            "a table cannot be both partitioned and clustered "
            "(CLUSTER BY and PARTITIONED BY are mutually exclusive)"
        )
    names = {f.name for f in schema.fields}
    missing = [c for c in cluster_by if c not in names]
    if missing:
        raise DeltaError(f"cluster_by columns not in schema: {missing}")
    if len(set(cluster_by)) != len(cluster_by):
        raise DeltaError("cluster_by columns must be distinct")


def domain_action(cluster_by: list[str], schema: T.StructType):
    """The delta.clustering DomainMetadata for ``cluster_by`` (LOGICAL
    names; stored as physical-name paths per the protocol)."""
    from delta_rs_spark.log.actions import DomainMetadata
    from delta_rs_spark.plans import column_mapping as cmap

    phys = {f.name: cmap._physical_name(f) for f in schema.fields}
    cols = [[phys.get(c, c)] for c in cluster_by]
    return DomainMetadata(DOMAIN, json.dumps({"clusteringColumns": cols}), False)


def clustering_columns(snapshot) -> list[str] | None:
    """LOGICAL clustering column names of a clustered table, or None.

    Reads every spelling real engines produce, newest first:

    * ``delta.clustering`` domain, ``{"clusteringColumns": [[...]]}``
      (delta-spark GA convention; what this engine writes);
    * ``delta.liquid`` domain, ``clusteringColumns:
      [{"physicalName": [...]}]`` (the preview convention the reference
      parses in protocol/mod.rs:717);
    * ``delta.liquid.clusteringColumns`` TABLE PROPERTY (the earliest
      preview — reference corpus table_with_liquid_clustering).

    Physical-name paths translate back through the schema; only
    top-level columns are supported (nested clustering paths raise)."""
    from delta_rs_spark.log.commit import DeltaError
    from delta_rs_spark.plans import column_mapping as cmap

    paths: list | None = None
    for domain in (DOMAIN, "delta.liquid"):
        dm = snapshot.domain_metadata.get(domain)
        if dm is None:
            continue
        try:
            paths = json.loads(dm.configuration).get("clusteringColumns") or []
        except (ValueError, TypeError):
            paths = None
        if paths is not None:
            break
    if paths is None:
        prop = (snapshot.configuration or {}).get("delta.liquid.clusteringColumns")
        if not prop:
            return None
        paths = [c.strip() for c in prop.split(",") if c.strip()]
    schema = T.StructType.fromJson(json.loads(snapshot.schema_string))
    logical = {cmap._physical_name(f): f.name for f in schema.fields}
    out: list[str] = []
    for p in paths:
        if isinstance(p, dict):  # delta.liquid preview: {"physicalName": [...]}
            parts = p.get("physicalName") or []
        elif isinstance(p, list):
            parts = p
        else:
            parts = [p]
        if len(parts) != 1:
            raise DeltaError(
                f"nested clustering column path {parts} is not supported"
            )
        out.append(logical.get(parts[0], parts[0]))
    return out or None
