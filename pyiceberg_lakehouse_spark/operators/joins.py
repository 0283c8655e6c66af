"""Join-side reducers: shrink the shuffled side of a big join BEFORE the
exchange.

At 100 TB the dominant cost of ``fact JOIN dim`` on a selective dim filter
is shuffling the whole fact table only to drop most of it at the probe.
Engines attack this with runtime filters (Spark's injected bloom filter,
Trino's dynamic filtering); this module exposes the same reduction as an
explicit, composable DataFrame operator that works on ANY plan — including
our snapshot-log lakehouse scans, which the built-in optimizer rule cannot
see through.

``semi_join_reduce`` is a one-hash bloom filter expressed as a broadcast
LEFT SEMI join on hash buckets:

- the reducer side is ``distinct(pmod(xxhash64(key), m))`` of the dim keys
  — AT MOST ``m`` longs (8·m bytes), so it broadcasts even when the dim
  side itself is far too large to broadcast. That bound is the whole
  design: the reduction is always broadcast-safe, independent of dim
  cardinality;
- the fact side is filtered map-side (BroadcastHashJoin LeftSemi inside
  the scan stage, before any exchange), so only surviving rows shuffle;
- false positives pass ~n_distinct/m of non-matching rows — harmless,
  the real join still runs and owns correctness. Size ``m`` ≳ 100× the
  expected distinct dim keys where memory allows (default 2^20 buckets =
  8 MB broadcast worst-case).

Everything is JVM-side (xxhash64 + pmod inside whole-stage codegen); no
driver collect, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 1 << 20

_BUCKET = "_sjr_bucket"


def semi_join_reduce(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    m: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Pre-filter ``fact`` to rows whose key hash-bucket appears among
    ``dim``'s key buckets, via a broadcast LEFT SEMI join.

    Returns ``fact`` rows unchanged (same schema) minus most rows that
    cannot match the subsequent join. Follow with the real
    ``fact.join(dim, ...)`` — this operator is a cost optimization only
    and admits ~n_distinct/m false positives by design.
    """
    dim_key = dim_key or fact_key
    buckets = dim.select(
        F.pmod(F.xxhash64(F.col(dim_key)), F.lit(m)).alias(_BUCKET)
    ).distinct()
    return fact.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64(F.col(fact_key)), F.lit(m)) == F.col(_BUCKET),
        "left_semi",
    )
