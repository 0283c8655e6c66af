"""Structured Streaming primitives over the events table.

The reference has no streaming surface (SURVEY.md §1.1); this covers the
gap-list category (§2.10): file-source streams, watermarks, tumbling/sliding
windows, and stateful dedup. Batch-equivalence is the correctness story —
every streaming query here has a batch SQL twin the oracle runs.

The events parquet stores TIMESTAMP(NANOS or MICROS, generation-dependent);
the stream source applies the same footer-probed long->micros conversion as
the batch loader (sources/testdata.py).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from pyiceberg_lakehouse_spark.localdf import local_rows_df
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, events_ts_unit
from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (one-file directory).

    The sf dir mixes all tables, so the stream reads through a symlinked
    single-table directory; ``pathGlobFilter`` would also work but the
    explicit dir keeps file listing O(1).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    stage = session_tmpdir(prefix="events_stream_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    # watermarks require TIMESTAMP (with local tz), not NTZ; the session runs
    # UTC so wall-clock values match the batch/oracle NTZ values
    raw = spark.readStream.schema(SCHEMAS["events"]).parquet(stage)
    micros = "ts div 1000" if events_ts_unit(src) == "ns" else "ts"
    return raw.withColumn("ts", F.timestamp_micros(F.expr(micros)))


SENTINEL_USER = -1

# sf_dir -> staged horizon directory (see events_stream_with_horizon)
_HORIZON_STAGE_CACHE: dict = {}


def events_stream_with_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events stream plus two trailing SENTINEL batches that push the
    event-time watermark far past every real event — the harness that
    makes OUTER stream-stream joins emit their null-extended rows
    deterministically under availableNow.

    Why sentinels and not a plain filter trick: an outer join's
    null-extended output for row R is emitted only when the watermark
    proves no future match for R can arrive, and the watermark advances
    from rows that flow THROUGH the EventTimeWatermark node. Catalyst
    pushes deterministic filters (event-type pre-filters, and even
    post-join predicates on join keys) BELOW that node, so a sentinel
    must be shaped to SURVIVE every pushed filter: it carries a real
    event_type ('click'/'purchase') and the reserved ``SENTINEL_USER``
    id, and callers drop sentinel artifacts from the SINK's batch output
    (a streaming-side filter would be pushed below the watermark and
    defeat the whole mechanism). Two sentinel files (not one) because an
    eviction pass runs with the watermark as of the PREVIOUS batch — the
    second sentinel batch flushes state the first one unlocked.

    On a production unbounded stream none of this is needed: real
    traffic keeps advancing the watermark and outer results stream out
    continuously; the horizon only finalizes a FINITE replay.
    """
    import glob
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    unit = events_ts_unit(src)
    # The staged directory (symlink + the two sentinel files) is a pure
    # function of sf_dir, and SIX outer/anti/semi stream-join queries each
    # rebuilt it (a max-ts job + two single-row writes apiece). Memoize
    # per (process, sf_dir): every query still streams and joins from the
    # files fresh — only the deterministic fixture staging is shared,
    # the same pattern as the MoR fixture memo (guide §2.6: don't redo
    # identical setup work serially).
    stage = _HORIZON_STAGE_CACHE.get(sf_dir)
    if stage is None:
        stage = session_tmpdir(prefix="events_stream_hz_")
        os.symlink(src, os.path.join(stage, "0_events.parquet"))
        mult = 1_000_000_000 if unit == "ns" else 1_000_000
        mx = (
            spark.read.schema(SCHEMAS["events"])
            .parquet(src)
            .agg(F.max("ts").alias("m"))
            .collect()[0]["m"]
        )  # raw long in the file's unit
        for i, days in ((1, 30), (2, 60)):
            ts_raw = int(mx) + days * 86400 * mult
            sent = local_rows_df(spark,
                [
                    (99999980 + i * 2, ts_raw, SENTINEL_USER, "click", 0.0, "{}"),
                    (99999981 + i * 2, ts_raw, SENTINEL_USER, "purchase", 0.0, "{}"),
                ],
                SCHEMAS["events"],
            )
            d = os.path.join(stage, f"_tmp{i}")
            sent.coalesce(1).write.mode("overwrite").parquet(d)
            part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(stage, f"{i}_sentinel.parquet"))
            shutil.rmtree(d)
        _HORIZON_STAGE_CACHE[sf_dir] = stage
    raw = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    micros = "ts div 1000" if unit == "ns" else "ts"
    return raw.withColumn("ts", F.timestamp_micros(F.expr(micros)))


def run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    """Drain a stream into an in-memory table with availableNow, return it."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def tumbling_counts(
    events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window count + exact sum per window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n", "sum_value"
        )
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Sliding-window event counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup on event_id (dropDuplicatesWithinWatermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
