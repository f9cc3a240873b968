"""delta_rs_spark — a PySpark-native engine with the query and
data-processing capabilities of delta-io/delta-rs.

Spark is the data plane (DataFrame/SQL/Catalyst/Structured Streaming);
a pure-Python Delta-protocol transaction log is the control plane
(this container has no delta-spark jars, so the log layer —
actions/snapshots/OCC/checkpoints per the public Delta protocol — is
implemented here and Parquet data files are read/written by Spark).
"""

from delta_rs_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
