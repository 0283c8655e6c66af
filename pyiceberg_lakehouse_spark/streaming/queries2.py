"""Sessionization, custom stateful operator, sliding windows, salted agg —
driver-facing registrations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.registry import register
from pyiceberg_lakehouse_spark.sources.testdata import load_table
from pyiceberg_lakehouse_spark.streaming import windows as W
from pyiceberg_lakehouse_spark.streaming.sessions import sessionize
from pyiceberg_lakehouse_spark.streaming.stateful import user_running_totals

SESSION_SQL = """
    with ordered as (
      select user_id, ts, value,
             case when ts - lag(ts) over (partition by user_id order by ts, event_id)
                       >= interval 30 minute
                  then 1 else 0 end as brk,
             event_id
      from events
    ),
    sess as (
      select user_id, ts, value,
             sum(brk) over (partition by user_id order by ts, event_id
                            rows unbounded preceding) as sid
      from ordered
    )
    select user_id, min(ts) as session_start, count(*) as n_events,
           cast(sum(cast(value as decimal(18,4))) as double) as sum_value
    from sess group by user_id, sid
"""


@register("events_session_windows", SESSION_SQL)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (session_window ≡ islands-and-gaps SQL)."""
    return sessionize(load_table(spark, sf_dir, "events"), gap="30 minutes")


@register("stream_session_windows", SESSION_SQL)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sessionization in append mode — the watermark-complete
    form: ``session_window`` over the event STREAM emits a session row
    only once the event-time watermark proves the session closed (no
    event within the gap can still arrive). Merging is incremental
    state-store work: sessions extend and coalesce as events arrive,
    unlike the batch form's full-shuffle groupBy. The horizon sentinels
    (streaming/windows.py::events_stream_with_horizon) push the
    watermark past every real event under the finite availableNow
    replay, so ALL sessions finalize and the append-mode output equals
    the batch islands-and-gaps oracle exactly — same twin as
    events_session_windows, computed by the streaming engine's state
    machinery instead of a window function. Sentinel-user sessions are
    dropped from the SINK output (a stream-side filter would be pushed
    below the watermark node and defeat the horizon)."""
    ev = W.events_stream_with_horizon(spark, sf_dir)
    sess = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    out = W.run_to_memory(sess, output_mode="append")
    return out.filter(F.col("user_id") != W.SENTINEL_USER)


@register(
    "stream_user_running_totals",
    """
    select user_id, count(*) as n_events,
           cast(sum(cast(value as decimal(18,4))) as double) as sum_value
    from events group by user_id
    """,
)
def stream_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals. The file stream arrives as one micro-batch, so the emitted
    update rows equal the batch aggregate the oracle computes."""
    ev = W.events_stream(spark, sf_dir).select("user_id", "value")
    return W.run_to_memory(user_running_totals(ev), output_mode="update")


@register(
    "stream_sliding_2h",
    """
    select window_start, count(*) as n from (
      select unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - interval 1 hour]) as window_start
      from events
    ) group by window_start
    """,
)
def stream_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide): each event lands in two
    windows; the oracle expands the two memberships with a lateral VALUES."""
    ev = W.events_stream(spark, sf_dir)
    return W.run_to_memory(
        W.sliding_counts(ev, window_len="2 hours", slide="1 hour"), output_mode="complete"
    )


@register(
    "agg_salted_groupby",
    """
    select l_returnflag, count(*) as n,
           cast(sum(cast(l_quantity as decimal(18,4))) as double) as sum_qty
    from lineitem group by l_returnflag
    """,
)
def agg_salted_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted aggregation == plain groupBy result."""
    from pyiceberg_lakehouse_spark.operators.skew import salted_groupby

    li = load_table(spark, sf_dir, "lineitem")
    return salted_groupby(
        li,
        keys=["l_returnflag"],
        aggs=[
            F.count("*").alias("_n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_s"),
        ],
        reaggs=[
            F.sum("_n").alias("n"),
            F.sum("_s").cast("double").alias("sum_qty"),
        ],
    )
