"""Lakehouse table as a Structured Streaming sink and source.

Sink: ``foreachBatch`` appends each micro-batch as one snapshot, recording
the batch id in the snapshot summary. Streaming restarts replay the last
uncommitted batch; the batch-id check makes the append idempotent, so the
table sees each micro-batch exactly once even though foreachBatch itself is
at-least-once. (Same idea as Iceberg's Spark streaming writer, which stores
the batch id in snapshot properties.)

Source: the data directory is a file-stream source — new commit directories
match the glob on each micro-batch listing, so every APPENDED file streams
exactly once (the checkpoint tracks seen paths). Restriction, shared with
file-based change feeds generally: the streamed table must be append-only;
``overwrite``/``replace`` (compaction, upsert) rewrite history that a file
stream cannot represent, and readers should re-seed from a fresh checkpoint
after such operations.

At 100 TB the sink path is the same write path as batch appends (partitioned
zstd parquet + one atomic log commit per trigger) and the source never lists
more than the data dir — O(files), with the micro-batch size capped by
``maxFilesPerTrigger`` if backfill pressure matters.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable


def committed_batch_ids(table: LakehouseTable) -> set[int]:
    """Batch ids already appended by a streaming sink (replay guard)."""
    return {
        int(s.summary["streaming_batch_id"])
        for s in table.log.snapshots
        if "streaming_batch_id" in s.summary
    }


def write_stream_to_table(
    stream_df: DataFrame,
    table: LakehouseTable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream into a lakehouse table: one idempotent append per micro-batch."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # reload the log so a restarted query sees commits from the prior run
        table.log.load()
        if batch_id in committed_batch_ids(table):
            return  # replayed batch — already committed, exactly-once holds
        if batch_df.isEmpty():
            return
        table.append(batch_df, summary={"streaming_batch_id": batch_id})

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_to_indexed_table(
    stream_df: DataFrame,
    table: LakehouseTable,
    checkpoint_dir: str,
    refresh_every: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous ANN ingestion: the exactly-once micro-batch append sink
    composed with periodic ``refresh_ann_indexes`` — streamed vectors
    become probe-visible after at most ``refresh_every`` batches instead
    of waiting for an offline maintenance pass.

    The refresh cadence is derived from LOG STATE (append snapshots since
    the last index epoch), not an in-memory counter, so a restarted query
    resumes the cadence correctly and a replayed batch never double-
    refreshes. Between refreshes, probes fail loudly via the staleness
    guard (similarity.ivf_index_topk) rather than silently missing the
    streamed rows — allow_stale=True reads the indexed prefix.
    """
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
        ann_index_epoch,
        refresh_ann_indexes,
    )

    # fail fast BEFORE any batch commits: if no index was ever built,
    # refresh_ann_indexes would raise AFTER the first append — and on
    # restart the batch id is already committed, so it raises again
    # immediately and the stream is permanently wedged half-ingested
    if ann_index_epoch(table) is None:
        raise ValueError(
            f"table at {table.table_dir!r} has no persisted ANN index; run "
            "build_ivf_index (and optionally build_pq_index) before "
            "streaming into it"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        table.log.load()
        if batch_id not in committed_batch_ids(table):
            if batch_df.isEmpty():
                return
            table.append(batch_df, summary={"streaming_batch_id": batch_id})
        epoch = ann_index_epoch(table)
        pending = sum(
            1
            for s in table.log.snapshots
            if "streaming_batch_id" in s.summary and s.snapshot_id > (epoch or 0)
        )
        if pending >= refresh_every:
            refresh_ann_indexes(table)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_table_stream(
    spark: SparkSession,
    table: LakehouseTable,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over an append-only lakehouse table's data files.

    Partition columns are not re-derived (hive segments under varying commit
    dirs defeat the stream source's discovery), so this serves unpartitioned
    tables — partitioned streaming reads go through periodic batch
    ``scan()`` + snapshot diffing instead.
    """
    if table.log.partition_by:
        raise ValueError(
            "streaming source supports unpartitioned tables; "
            "use scan() snapshot diffs for partitioned ones"
        )
    schema: T.StructType = table.schema()
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    glob_path = os.path.join(table.table_dir, "data", "*")
    return reader.option("pathGlobFilter", "*.parquet").parquet(glob_path)


def stream_table_to_memory(
    df: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Drain a (table-sourced) stream into a memory table; returns it."""
    from pyiceberg_lakehouse_spark.streaming.windows import run_to_memory

    return run_to_memory(df, output_mode=output_mode)


def read_changes_stream(
    spark: SparkSession, table: LakehouseTable, from_snapshot: int = 0
) -> DataFrame:
    """Stream a table's row-level CHANGE FEED (``_change_type`` +
    ``_commit_snapshot_id`` on every row) via the registered data source.

    Appends plan as insert rows from metadata; copy-on-write rewrites plan
    the change-data files their commits persisted (table property
    ``change-data-feed=true``); compaction/z-order are invisible
    (data-change=false). The delta of each commit is all that is ever
    read — the streaming twin of ``LakehouseTable.table_changes``."""
    from pyiceberg_lakehouse_spark.sources.datasource import (
        register_lakehouse_source,
    )

    register_lakehouse_source(spark)
    reader = (
        spark.readStream.format("lakehouse")
        .option("change_feed", "true")
        .option("from_snapshot", from_snapshot)
    )
    if table.log.branch:
        reader = reader.option("branch", table.log.branch)
    return reader.load(table.table_dir)


def stream_write_audit_publish(
    stream_df: DataFrame,
    table: LakehouseTable,
    checkpoint_dir: str,
    audits: list | None = None,
    branch: str = "_wap_stream",
) -> Any:
    """Write-audit-publish on a LIVE pipeline: stream micro-batches onto a
    branch ref (same exactly-once batch-id sink), audit the branch's full
    staged state once the stream drains, then land it on this table with an
    atomic fast-forward.

    Main never exposes unaudited micro-batches — the difference from the
    plain streaming sink, where each trigger publishes immediately. A failed
    audit drops the branch; main stays byte-identical and the stream can be
    re-run from a fresh checkpoint after the upstream fix. The branch
    carries only metadata (snapshots + file lists); staged data files are
    shared with main's directory, so staging cost is the data write itself,
    no copy on publish.

    Restart safety: if the branch already exists (a prior attempt crashed
    before publish), it is resumed — the batch-id guard skips every
    micro-batch the old run committed, so re-running the same checkpoint
    converges instead of duplicating.

    ``audits``: callables ``(DataFrame) -> bool`` over the staged scan,
    same contract as ``LakehouseTable.write_audit_publish``.
    """
    staged = (
        LakehouseTable(table.spark, table.table_dir, branch=branch)
        if branch in table.branches()
        else table.create_branch(branch)
    )
    try:
        q = write_stream_to_table(stream_df, staged, checkpoint_dir)
        q.awaitTermination()
        view = staged.scan()
        for i, audit in enumerate(audits or []):
            if not audit(view):
                raise ValueError(
                    f"streaming WAP audit #{i} "
                    f"({getattr(audit, '__name__', 'audit')}) failed; "
                    "nothing published"
                )
        table.fast_forward(branch)
        return table.log.snapshots[-1]
    finally:
        table.drop_branch(branch)


def write_stream_with_rollup(
    stream_df: DataFrame,
    table: LakehouseTable,
    rollup: LakehouseTable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous aggregate maintenance: the exactly-once micro-batch
    append sink composed with ``refresh_rollup`` — the summary table tracks
    the stream at micro-batch granularity, and each refresh aggregates ONLY
    that batch's files (the rollup cursor advances along the snapshot log;
    the fact table is never rescanned).

    Replays are idempotent twice over: a committed batch id skips the
    append, and a refresh with no new snapshot is a metadata noop — so a
    restarted query converges to the same summary state it would have
    reached uninterrupted.
    """
    from pyiceberg_lakehouse_spark.lakehouse.rollup import refresh_rollup

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        table.log.load()
        if batch_id not in committed_batch_ids(table):
            if batch_df.isEmpty():
                return
            table.append(batch_df, summary={"streaming_batch_id": batch_id})
        rollup.log.load()
        refresh_rollup(rollup, table)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_with_index(
    stream_df: DataFrame,
    table: LakehouseTable,
    index: LakehouseTable,
    checkpoint_dir: str,
    refresh_fn,
    available_now: bool = True,
) -> StreamingQuery:
    """THE index-maintaining sink: the exactly-once micro-batch append
    composed with an arbitrary cursor-based index refresh
    (``refresh_fn(index, source_table) -> dict``) — one implementation
    of the replay protocol (committed batch ids skip the append, a
    refresh with no new snapshot is a noop, log reloads make restarts
    see prior commits) shared by the text-index and near-dup sinks
    below, so a fix to the exactly-once logic lands everywhere at once.
    Each batch's refresh processes only that batch's files: the index
    cursor advances along the snapshot log and the corpus is never
    re-read."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        table.log.load()
        if batch_id not in committed_batch_ids(table):
            if batch_df.isEmpty():
                return
            table.append(batch_df, summary={"streaming_batch_id": batch_id})
        index.log.load()
        refresh_fn(index, table)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_with_text_index(
    stream_df: DataFrame,
    table: LakehouseTable,
    index: LakehouseTable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous LEXICAL-search maintenance: the shared index sink with
    ``refresh_text_index`` — the inverted index tracks the document
    stream at micro-batch granularity, tokenizing only each batch's
    files."""
    from pyiceberg_lakehouse_spark.lakehouse.text_index import (
        refresh_text_index,
    )

    return write_stream_with_index(
        stream_df, table, index, checkpoint_dir, refresh_text_index,
        available_now=available_now,
    )


def write_stream_with_neardup_index(
    stream_df: DataFrame,
    table: LakehouseTable,
    index: LakehouseTable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous NEAR-DUP maintenance: the exactly-once micro-batch
    append sink composed with ``refresh_neardup_index`` — the banded
    MinHash signature index tracks the document stream at micro-batch
    granularity, re-signaturing only each batch's files (the cursor
    advances along the snapshot log; the corpus is never re-read). This
    is the production crawl-ingest shape: every arriving batch becomes
    immediately near-dup-queryable against everything before it."""
    from pyiceberg_lakehouse_spark.lakehouse.neardup import (
        refresh_neardup_index,
    )

    return write_stream_with_index(
        stream_df, table, index, checkpoint_dir, refresh_neardup_index,
        available_now=available_now,
    )


def write_stream_with_media_samples(
    stream_df: DataFrame,
    table: LakehouseTable,
    index: LakehouseTable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous MEDIA-DEMUX maintenance: the exactly-once micro-batch
    append sink composed with ``refresh_media_samples`` — the per-sample
    table (trak routing, timestamps, byte extents, key-frame flags)
    tracks the media-document stream at micro-batch granularity,
    demuxing only each batch's files (the cursor advances along the
    snapshot log; the corpus is never re-demuxed). This is the
    production video-crawl shape: every arriving batch's key frames are
    immediately queryable for sampling/curation."""
    from pyiceberg_lakehouse_spark.lakehouse.media import (
        refresh_media_samples,
    )

    return write_stream_with_index(
        stream_df, table, index, checkpoint_dir, refresh_media_samples,
        available_now=available_now,
    )
