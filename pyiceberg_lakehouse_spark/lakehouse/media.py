"""Incrementally-maintained media sample table (MP4 demux as a derived
table).

A video-curation pipeline doesn't re-demux its corpus per query: the
per-sample metadata (trak routing, timestamps, byte extents, key-frame
flags) is itself a table, maintained as documents arrive. This module
persists the multi-track demux output (operators/multimodal.py::
demux_mp4_multitrack — one row per (trak, sample)) as a lakehouse table
with the rollup/text-index/near-dup cursor pattern: the sample table
records the source snapshot it covers, and ``refresh_media_samples``
demuxes ONLY the files appended since that cursor (``read_incremental``
plans them from snapshot metadata) and appends their sample rows. Demux
output is a pure addition under append-only history because a document
appears in exactly one append; non-append history (rewrites, deletes)
voids that and falls back to a full rebuild, mode recorded.

At 100 TB this is the difference between demuxing a crawl batch and
re-demuxing a corpus: refresh cost is O(appended bytes), and the demux
itself is a zero-shuffle map stage (plan-tested).

Reference parity: ashkangoleh/pyiceberg-lakehouse treats media as opaque
binary columns end-to-end; this engine adds the maintained demux layer a
frame-sampling curation pass reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable
from pyiceberg_lakehouse_spark.operators.multimodal import demux_mp4_multitrack


def _sample_rows(df: DataFrame, id_col: str) -> DataFrame:
    """Per-(trak, sample) rows via THE one demux implementation — the
    maintained table and the ad-hoc operator can never drift."""
    return demux_mp4_multitrack(df, id_col=id_col)


def create_media_sample_table(
    lh,
    source: LakehouseTable,
    name: str,
    id_col: str = "doc_id",
) -> LakehouseTable:
    """Demux the source's current snapshot into a new sample table and
    record the cursor + id column as table properties.

    Same commit ordering as refresh: the initial append carries its
    covers-snapshot summary and the cursor property moves AFTER it, so a
    crash at any point leaves a state refresh can recover (before the
    append: sentinel cursor -1 -> KeyError -> full rebuild; between
    append and set_properties: summary repair)."""
    head = source.log.current_snapshot_id()
    rows_df = _sample_rows(source.scan(), id_col)
    idx = lh.create_table(
        name,
        rows_df.schema,
        properties={
            "media.id-col": id_col,
            "media.last-snapshot": "-1",
        },
    )
    idx.append(rows_df, summary={"media.covers-snapshot": str(head)})
    idx.set_properties({"media.last-snapshot": str(head)})
    return idx


def refresh_media_samples(idx: LakehouseTable, source: LakehouseTable) -> dict:
    """Advance the sample table to the source head: demux the appended
    files only and APPEND their rows (new documents cannot touch existing
    samples). Non-append history falls back to a full rebuild.

    Crash safety: the cursor moves via set_properties AFTER the append
    commits (the conflict-retry-safe ordering; see
    neardup.refresh_neardup_index), which opens a window — a crash between
    the two commits leaves rows appended but the cursor behind, and unlike
    the near-dup index (whose candidate pairs are distinct()-deduped) the
    sample table has no downstream dedup, so a naive re-refresh would
    duplicate every (id, track_id, sample_idx) row of the delta forever.
    Each append therefore records the source snapshot it covers in its
    OWN commit summary (``media.covers-snapshot``), and refresh first
    repairs a lagging cursor from the head snapshot's summary — a
    metadata-only O(1) recovery, no re-demux, no index-wide anti-join."""
    id_col = idx.log.properties["media.id-col"]
    cursor = int(idx.log.properties["media.last-snapshot"])
    head = source.log.current_snapshot_id()
    repaired = False
    snaps = idx.log.snapshots
    if snaps and snaps[-1].operation == "append":
        covered = snaps[-1].summary.get("media.covers-snapshot")
        if covered is not None and int(covered) != cursor:
            # crash window: the delta up to `covered` is already appended,
            # only the cursor write was lost — repair it, don't re-demux
            cursor = int(covered)
            idx.set_properties({"media.last-snapshot": str(cursor)})
            repaired = True
    if head == cursor:
        mode = "noop-repair" if repaired else "noop"
        return {"mode": mode, "covered_snapshot": cursor}
    try:
        delta = source.read_incremental(cursor, head)
        new_rows = _sample_rows(delta, id_col)
        idx.append(new_rows, summary={"media.covers-snapshot": str(head)})
        idx.set_properties({"media.last-snapshot": str(head)})
        mode = "incremental-repair" if repaired else "incremental"
    except (ValueError, KeyError):
        rows_df = _sample_rows(source.scan(), id_col)
        # overwrite never auto-retries, so the in-memory mutation persists
        # atomically with the commit or the commit raises
        idx.log.properties["media.last-snapshot"] = str(head)
        idx.overwrite(rows_df, summary={"op": "media_rebuild"})
        mode = "full"
    return {"mode": mode, "covered_snapshot": head}
