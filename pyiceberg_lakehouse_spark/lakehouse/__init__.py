"""Lakehouse lifecycle on partitioned Parquet + a per-table JSON snapshot log.

Replaces the reference's PyIceberg catalog/manifest machinery with the
minimal semantics it actually uses (SURVEY.md §1.1, §2.7): atomic
append/overwrite commits, snapshot history, time travel, metadata-only file
registration — implemented as driver-side JSON log commits via atomic rename
(single-writer, like the reference's SQLite catalog).
"""

from pyiceberg_lakehouse_spark.lakehouse.log import Snapshot, SnapshotLog
from pyiceberg_lakehouse_spark.lakehouse.table import Lakehouse, LakehouseTable

__all__ = ["Lakehouse", "LakehouseTable", "Snapshot", "SnapshotLog"]
