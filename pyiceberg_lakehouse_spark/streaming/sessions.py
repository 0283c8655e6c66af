"""Session windows: gap-based sessionization over per-user event streams.

``session_window`` works in both batch and streaming groupBy; the batch form
is oracle-checkable against an islands-and-gaps SQL rewrite (lag + running
sum of session breaks), which is also how a SQL-only engine would express it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions: start, event count, exact value sum.

    A new session starts when the gap since the previous event is >= the
    threshold. Output keys on (user_id, session_start).
    """
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
