"""Skew-handling: salted aggregation and salted join.

AQE's skew-join splitting handles most runtime skew, but heavily skewed
aggregation keys (one key holding 30%+ of a 100 TB table) still bottleneck a
single reducer. Salting splits each hot key across ``n_salts`` partial
groups, aggregates, then combines — two small shuffles instead of one
stuck-straggler shuffle. Results are identical to the unsalted plan, which
is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    reaggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` aggregate within (key, salt); ``reaggs`` combine the partials
    per key (e.g. phase 1 ``count(*) as n`` -> phase 2 ``sum(n) as n``).
    The salt is a uniform hash of a monotonic id, so hot keys spread evenly.
    """
    salted = df.withColumn("_salt", (F.monotonically_increasing_id() % n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*reaggs)


def salted_join_broadcast_hot(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
) -> DataFrame:
    """Skew join via hot-key split: hot keys take the broadcast path, the
    long tail takes the normal shuffle join, results union.

    The classic pre-AQE pattern; with AQE skew-join on, Spark does the
    equivalent at runtime — this exists for engines/pipelines where the hot
    keys are known ahead of time and the dim side fits memory for them.
    """
    hot = F.col(key).isin(hot_keys)
    fact_hot, fact_cold = fact.filter(hot), fact.filter(~hot)
    dim_hot, dim_cold = dim.filter(hot), dim.filter(~hot)
    joined_hot = fact_hot.join(F.broadcast(dim_hot), key)
    joined_cold = fact_cold.join(dim_cold, key)
    return joined_hot.unionByName(joined_cold)
