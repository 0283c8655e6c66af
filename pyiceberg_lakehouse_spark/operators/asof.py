"""As-of join: match each left row to the latest earlier right row.

Spark has no built-in ASOF JOIN; the scalable composition is union + one
window pass (one shuffle on the join key), never a per-left-row lookup:

1. union left rows (carrying NULL marker) with right rows (carrying their id),
2. sort within each key partition by (ts, id),
3. ``last(marker, ignorenulls) over rows unbounded-preceding .. -1`` picks the
   most recent right row strictly before the current row,
4. keep the left rows.

At 100 TB this is a single hash-partitioned shuffle + in-partition sort —
exactly the plan a native as-of operator would produce. Strictly-before
semantics with (ts, id) lexicographic ordering keep results deterministic
under timestamp ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Generic as-of join of two event frames on ``key``.

    Returns the left frame's (left_id, key) plus ``matched_<right_id>`` — the
    right frame's id of the latest row with (ts, id) strictly below the left
    row's (ts, id), or NULL when none exists.
    """
    r = right.select(
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.col(right_id).alias("_ord_id"),
        F.col(right_id).alias("_marker"),
    )
    l = left.select(  # noqa: E741
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.col(left_id).alias("_ord_id"),
        F.lit(None).cast(r.schema["_marker"].dataType).alias("_marker"),
    ).withColumn("_left_id", F.col("_ord_id"))
    r = r.withColumn("_left_id", F.lit(None).cast(l.schema["_left_id"].dataType))

    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_ord_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = unioned.withColumn("_match", F.last("_marker", ignorenulls=True).over(w))
    return matched.filter(F.col("_left_id").isNotNull()).select(
        F.col("_left_id").alias(left_id),
        F.col(key),
        F.col("_match").alias(f"matched_{right_id}"),
    )


def asof_join_events(
    events: DataFrame,
    left_type: str,
    right_type: str,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Events-table convenience: purchase->latest-earlier-click style as-of."""
    left = events.filter(F.col("event_type") == left_type)
    right = events.filter(F.col("event_type") == right_type)
    out = asof_join(left, right, key=key, ts_col=ts_col, left_id=id_col, right_id=id_col)
    # column names per the registered oracle: event_id, user_id, click_event_id
    return out.select(
        F.col(id_col).alias("event_id"),
        F.col(key).alias("user_id"),
        F.col(f"matched_{id_col}").alias(f"{right_type}_event_id"),
    )
