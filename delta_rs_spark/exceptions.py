"""Public exception module, mirroring ``deltalake.exceptions``
(reference: python/deltalake/exceptions.py — DeltaError, CommitFailedError,
DeltaProtocolError, SchemaMismatchError, TableNotFoundError).

The concrete classes live next to the code that raises them
(log/commit.py, writer.py); this module is the stable import path.
"""

from delta_rs_spark.log.commit import (
    CommitFailedError,
    DeltaError,
    DeltaProtocolError,
    TableNotFoundError,
)
from delta_rs_spark.writer import SchemaMismatchError

__all__ = [
    "CommitFailedError",
    "DeltaError",
    "DeltaProtocolError",
    "SchemaMismatchError",
    "TableNotFoundError",
]
