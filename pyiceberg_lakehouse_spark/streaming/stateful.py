"""Custom stateful streaming operator: per-key running counters via
applyInPandasWithState (the escape hatch for semantics Spark's built-in
stateful operators can't express).

State is one (count, value_sum) pair per user_id; each micro-batch folds its
Arrow-batched rows into the state and emits the updated totals. At scale
this is hash-partitioned by key with state in the state store — the same
execution shape as dropDuplicates/windowed aggs.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# the running sum is kept in integer cents: float accumulation order varies
# (numpy pairwise vs engine-sequential), integer accumulation doesn't —
# the emitted double is then bit-identical to an exact decimal sum
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [cents / 100.0]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) with custom state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class RunningTotalsProcessor:
    """The same per-user running totals on Spark 4's transformWithState API
    (StatefulProcessor + typed ValueState) — the successor to
    applyInPandasWithState, with named state slots, TTL support, and timers.

    State layout matches ``_update`` above: (n, cents) per user, integer
    cents so accumulation order can't perturb the emitted double.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, cents = self._totals.get() if self._totals.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [cents / 100.0]}
        )

    def close(self) -> None:
        pass


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas variant of ``user_running_totals``."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclassing at call time keeps the module importable on older PySpark
    proc = type(
        "RunningTotalsTWS", (StatefulProcessor,), dict(RunningTotalsProcessor.__dict__)
    )()
    return events.groupBy("user_id").transformWithStateInPandas(
        proc,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
