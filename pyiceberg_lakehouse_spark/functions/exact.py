"""Exact (order-independent) float aggregation.

Floating-point sums depend on accumulation order, so a Spark sum and a DuckDB
sum of the same doubles can differ in the last ULP — enough to fail an exact
value-hash comparison. Routing the aggregation through DECIMAL makes it exact
and order-independent: both engines round each double to the same fixed-scale
decimal (ties sit on non-representable values, so rounding agrees), sum
decimals exactly, and cast the identical decimal back to an identical double.

The SQL twins of these helpers are inlined in each oracle string:
``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(c).cast("double")
    ).alias(alias)


def dot_product_exact(a: str | Column, b: str | Column) -> Column:
    """Exact dot product of two float arrays via decimal accumulation.

    Stays entirely in Catalyst higher-order functions (zip_with + aggregate)
    — no Python UDF, JVM-side and codegen'd (SURVEY.md §7 hard-part 6). Each
    float is rounded to decimal(9,6) (embeddings are unit-scale), products
    are decimal(19,12), the running sum is pinned to decimal(38,12) so the
    fold's type is stable, and the final value is returned as double.
    """
    a_name = a if isinstance(a, str) else a._jc.toString()  # noqa: SLF001
    b_name = b if isinstance(b, str) else b._jc.toString()  # noqa: SLF001
    # float -> double -> decimal: a direct float->decimal cast rounds the
    # 7-digit shortest repr (Spark) vs the full binary value (DuckDB); via
    # double both engines round the same value, so results stay bit-identical
    # Numeric-parity constraints (each one found the hard way):
    # - factors cast float->double->decimal(10,7): via double so both engines
    #   round the same 17-digit value (a direct float cast rounds Spark's
    #   7-digit shortest repr instead);
    # - scale 7 factors => scale 14 products => for unit-scale embeddings the
    #   sum's integer representation stays below 2^53, so DuckDB's two-step
    #   decimal->double (int128 -> double -> /10^14) is exact-then-rounded
    #   and matches Spark's correctly-rounded conversion with NO intermediate
    #   rescale (a rescale would tie-break HALF_UP vs HALF_EVEN);
    # - accumulator precision 29, NOT 38: Spark sizes a decimal add as
    #   max(p1-s1, p2-s2) + s + 1 and past 38 it drops scale digits, rounding
    #   every fold step. (29,14)+(21,14) -> (30,14) stays exact.
    return F.expr(
        f"""
        cast(
          aggregate(
            zip_with({a_name}, {b_name},
                     (x, y) -> cast(cast(x as double) as decimal(10,7))
                               * cast(cast(y as double) as decimal(10,7))),
            cast(0 as decimal(29,14)),
            (acc, v) -> cast(acc + v as decimal(29,14))
          ) as double)
        """
    )


def dot_product_oracle_sql(a_expr: str, b_expr: str, dim: int) -> str:
    """DuckDB twin of :func:`dot_product_exact` (inline scalar expression).

    Uses an explicit index range so evaluation order and types match the
    Spark side exactly.
    """
    return f"""(
      select cast(sum(cast({a_expr}[i] as decimal(9,6)) * cast({b_expr}[i] as decimal(9,6))) as double)
      from range(1, {dim + 1}) t(i)
    )"""
