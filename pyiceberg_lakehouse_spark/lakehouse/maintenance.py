"""Table maintenance: small-file compaction and snapshot expiry.

The "maintenance" half of the lakehouse contract. Compaction mirrors the
reference's 512 MB target-file-size property (main-daft.py:106) — many small
commit files are rewritten into target-size files per partition and swapped
in via a ``replace`` snapshot, so readers never see a partial state.
"""

from __future__ import annotations

import math
import os

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable


def compact(table: LakehouseTable, target_file_bytes: int | None = None):
    """Rewrite the live file set at target file size (one replace snapshot).

    File count is sized from the actual on-disk bytes; the rewrite is
    repartitioned by the partition columns so each output file stays within
    one partition (no partition-crossing files, same as the write path).
    """
    if target_file_bytes is None:
        target_file_bytes = int(
            table.log.properties.get("write.target-file-size-bytes", 512 * 1024 * 1024)
        )
    files = table.log.live_files()
    if not files:
        return None
    total = sum(os.path.getsize(f["path"]) for f in files if os.path.exists(f["path"]))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = table.scan().repartition(n_files, *(table.log.partition_by or []))
    removed = [f["path"] for f in files]
    new_files = table._write_data(df)
    return table._commit(
        "replace",
        new_files,
        removed_paths=removed,
        summary={"op": "compact", "files_before": len(files), "files_after": len(new_files)},
    )


def expire_snapshots(table: LakehouseTable, keep_last: int = 1) -> list[str]:
    """Drop history older than the last ``keep_last`` snapshots and delete
    data files no longer reachable from any retained snapshot state.

    Returns the deleted paths. Time travel to expired snapshots stops
    working (that is the point); the current state is never touched.
    """
    log = table.log
    if len(log.snapshots) <= keep_last:
        return []
    # files reachable from any retained snapshot's replayed state
    retained_ids = [s.snapshot_id for s in log.snapshots[-keep_last:]]
    reachable: set[str] = set()
    for sid in retained_ids:
        reachable.update(f["path"] for f in log.live_files(sid))
    # every file ever added
    all_paths = {f["path"] for s in log.snapshots for f in s.added_files}
    orphaned = sorted(all_paths - reachable)
    # squash: keep a synthetic base snapshot carrying the oldest retained
    # state — including the merge-on-read deletes in effect there, so
    # deleted keys cannot resurrect after history is dropped
    base_files = log.live_files(retained_ids[0])
    base_deletes = log.live_deletes(retained_ids[0])
    base = log.snapshots[-keep_last]
    base.added_files = base_files
    base.removed_paths = []
    existing = {d["path"] for d in base.added_deletes}
    base.added_deletes = base.added_deletes + [
        d for d in base_deletes if d["path"] not in existing
    ]
    base.operation = "overwrite" if base.operation != "create" else "create"
    log.snapshots = log.snapshots[-keep_last:]
    log._write(expected_len=None)
    for p in orphaned:
        if os.path.exists(p):
            os.unlink(p)
    return orphaned
