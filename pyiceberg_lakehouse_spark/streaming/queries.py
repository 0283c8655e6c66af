"""Driver-facing streaming queries, each with a batch-SQL oracle twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.registry import register
from pyiceberg_lakehouse_spark.streaming import windows as W


@register(
    "stream_tumbling_hourly",
    """
    select date_trunc('hour', ts) as window_start,
           count(*) as n,
           cast(sum(cast(value as decimal(18,4))) as double) as sum_value
    from events group by 1
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows over the event stream == batch GROUP BY hour."""
    ev = W.events_stream(spark, sf_dir)
    return W.run_to_memory(W.tumbling_counts(ev), output_mode="complete")


@register(
    "stream_dedup_count",
    "select count(*) as n_unique from (select distinct event_id from events)",
)
def stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: the stream unioned with itself (every event twice),
    dropDuplicatesWithinWatermark restores exactly-once."""
    a = W.events_stream(spark, sf_dir)
    b = W.events_stream(spark, sf_dir)
    deduped = W.dedup_within_watermark(a.unionByName(b))
    out = W.run_to_memory(deduped.select("event_id"), output_mode="append")
    return out.agg(F.count("*").alias("n_unique"))
