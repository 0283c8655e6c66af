"""TPC-H-shaped analytical batch three: Q2/Q4/Q6/Q8/Q9/Q11/Q13/Q15/Q17/
Q20/Q21/Q22 shapes — completing all 22 canonical plan topologies.

The driver's reduced schemas lack partsupp and the lineitem commit/receipt
date columns, so several queries are re-expressed on what exists while
keeping the plan SHAPE that makes them interesting (reference scope:
main-polars-lazy.py:168-175 scans+filters+aggregates composed into joins):

- Q2  min-cost-supplier -> min-acctbal supplier per part via the lineitem
  bridge (correlated scalar subquery over a multi-join)
- Q4  commit<receipt EXISTS -> shipped->10-days-late EXISTS semi-join
- Q6  forecast revenue change — direct, all columns exist
- Q8  national market share (conditional share of a filtered volume)
- Q9  product-type profit with p_retailprice standing in for supplycost
- Q11 important-stock HAVING against a scalar aggregate of the whole fact
- Q13 customer order-count distribution (left join + double grouping)
- Q15 top supplier vs a scalar MAX over an aggregated subquery
- Q17 small-quantity revenue with a correlated per-part AVG
- Q20 nested-IN supplier shortlist
- Q21 multi-EXISTS self-joins (kept-waiting shape on last-shipper)
- Q22 anti-join + scalar-average filter over account balances

Scale posture matches batch two: dimensions broadcast, facts shuffle once
per join key, filters sit on scan columns for pushdown, and every float
aggregate rides the exact-decimal idiom so DuckDB hash-matches bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.queries.relational_tpch import (
    DISC_PRICE,
    REV_SQL,
    _disc_price,
    _rev,
)
from pyiceberg_lakehouse_spark.registry import register
from pyiceberg_lakehouse_spark.sources.testdata import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


Q2_SQL = """
    select p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, s.s_acctbal
    from part p
    join lineitem l on l.l_partkey = p.p_partkey
    join supplier s on s.s_suppkey = l.l_suppkey
    where p.p_size = 15
      and s.s_acctbal = (
        select min(s2.s_acctbal)
        from lineitem l2 join supplier s2 on s2.s_suppkey = l2.l_suppkey
        where l2.l_partkey = p.p_partkey
      )
    group by p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, s.s_acctbal
"""


@register("agg_q2_min_cost_supplier", Q2_SQL)
def agg_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part correlated MIN scalar subquery picking the
    cheapest supplier (lineitem bridges part<->supplier; acctbal stands in
    for the absent ps_supplycost). The subquery decorrelates into one
    aggregate + join under Catalyst — no per-row re-execution."""
    part, lineitem, supplier = _t(spark, sf_dir, "part", "lineitem", "supplier")
    bridge = (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", "s_suppkey", "s_name", "s_acctbal")
    )
    best = bridge.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        bridge.join(best, "l_partkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(
            F.broadcast(part.filter(F.col("p_size") == 15)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )


Q4_SQL = """
    select o.o_orderpriority, cast(count(*) as bigint) as order_count
    from orders o
    where o.o_orderdate >= timestamp '1996-01-01'
      and o.o_orderdate <  timestamp '1996-04-01'
      and exists (
        select 1 from lineitem l
        where l.l_orderkey = o.o_orderkey
          and l.l_shipdate > o.o_orderdate + interval 10 day
      )
    group by o.o_orderpriority
"""


@register("agg_q4_priority_check", Q4_SQL)
def agg_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS semi-join from orders into lineitem (late-shipment
    predicate stands in for commit<receipt), grouped priority counts."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 10 days")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


Q6_SQL = f"""
    select cast(cast(sum(
             cast(l_extendedprice as decimal(18,4)) *
             cast(l_discount as decimal(8,4))
           ) as decimal(30,6)) as double) as revenue
    from lineitem
    where l_shipdate >= timestamp '1996-01-01'
      and l_shipdate <  timestamp '1997-01-01'
      and l_discount between 0.03 and 0.05
      and l_quantity < 24
"""


@register("agg_q6_forecast_revenue", Q6_SQL)
def agg_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan-filter-aggregate — every predicate pushes to parquet;
    the whole plan is one scan plus a partial/final agg pair."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * F.col("l_discount").cast("decimal(8,4)")
        )
        .cast("decimal(30,6)")
        .cast("double")
        .alias("revenue")
    )


Q8_SQL = f"""
    with volumes as (
      select year(o.o_orderdate) as o_year,
             cast({DISC_PRICE} as decimal(30,6)) as volume,
             n2.n_name as supp_nation
      from lineitem l
      join part p on p.p_partkey = l.l_partkey
      join orders o on o.o_orderkey = l.l_orderkey
      join customer c on c.c_custkey = o.o_custkey
      join nation n1 on n1.n_nationkey = c.c_nationkey
      join region r on r.r_regionkey = n1.n_regionkey
      join supplier s on s.s_suppkey = l.l_suppkey
      join nation n2 on n2.n_nationkey = s.s_nationkey
      where r.r_name = 'AMERICA' and p.p_size < 10
    )
    select o_year,
           cast(cast(sum(case when supp_nation = 'NATION_5' then volume
                              else cast(0 as decimal(30,6)) end)
                as double) /
                cast(cast(sum(volume) as double) as double) as double)
             as mkt_share
    from volumes group by o_year
"""


@register("agg_q8_market_share", Q8_SQL)
def agg_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: 8-way join, conditional share of filtered volume per year.
    Both sums stay exact decimals; the single final division happens in
    double on both engines, so the quotient is bit-identical."""
    lineitem, part, orders, customer, nation, region, supplier = _t(
        spark, sf_dir,
        "lineitem", "part", "orders", "customer", "nation", "region", "supplier",
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        lineitem.join(F.broadcast(part.filter(F.col("p_size") < 10)),
                      F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
              F.col("r_regionkey") == F.col("n_regionkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().cast("decimal(30,6)").alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(30,6)")
    return vol.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


Q9_SQL = """
    select n.n_name as nation, year(o.o_orderdate) as o_year,
           cast(cast(sum(
             cast(l.l_extendedprice as decimal(18,4)) *
               cast(1 - l.l_discount as decimal(8,4))
             - cast(p.p_retailprice as decimal(18,4)) *
               cast(l.l_quantity as decimal(12,4))
           ) as decimal(30,6)) as double) as sum_profit
    from lineitem l
    join part p on p.p_partkey = l.l_partkey
    join supplier s on s.s_suppkey = l.l_suppkey
    join nation n on n.n_nationkey = s.s_nationkey
    join orders o on o.o_orderkey = l.l_orderkey
    where p.p_name like '%red%'
    group by n.n_name, year(o.o_orderdate)
"""


@register("agg_q9_product_profit", Q9_SQL)
def agg_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: LIKE-filtered part join over the full fact, profit =
    discounted revenue minus retail cost (p_retailprice standing in for
    ps_supplycost), grouped by supplier nation and order year."""
    lineitem, part, supplier, nation, orders = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    profit = _disc_price() - (
        F.col("p_retailprice").cast("decimal(18,4)")
        * F.col("l_quantity").cast("decimal(12,4)")
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(profit).cast("decimal(30,6)").cast("double").alias("sum_profit")
        )
    )


Q11_SQL = f"""
    select l.l_partkey as p_key, {REV_SQL} as part_value
    from lineitem l
    join supplier s on s.s_suppkey = l.l_suppkey
    join nation n on n.n_nationkey = s.s_nationkey
    where n.n_name = 'NATION_7'
    group by l.l_partkey
    having cast(cast(sum({DISC_PRICE}) as decimal(30,6)) as double) > (
      select 0.0012 * cast(cast(sum({DISC_PRICE}) as decimal(30,6)) as double)
      from lineitem l2
      join supplier s2 on s2.s_suppkey = l2.l_suppkey
      join nation n2 on n2.n_nationkey = s2.s_nationkey
      where n2.n_name = 'NATION_7'
    )
"""


@register("agg_q11_important_stock", Q11_SQL)
def agg_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped value per part HAVING a threshold computed by a
    scalar subquery over the SAME aggregate — Catalyst plans the scalar as
    one broadcast row, so the fact scans twice but never re-executes per
    group."""
    lineitem, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    german = (
        lineitem.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
    )
    per_part = german.groupBy(F.col("l_partkey").alias("p_key")).agg(
        _rev("part_value")
    )
    total = german.agg(_rev("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > 0.0012 * F.col("total_value"))
        .select("p_key", "part_value")
    )


Q13_SQL = """
    select c_count, cast(count(*) as bigint) as custdist
    from (
      select c.c_custkey, cast(count(o.o_orderkey) as bigint) as c_count
      from customer c
      left join orders o on o.o_custkey = c.c_custkey
                        and o.o_orderpriority <> '1-URGENT'
      group by c.c_custkey
    )
    group by c_count
"""


@register("agg_q13_customer_distribution", Q13_SQL)
def agg_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: outer join with a join-time residual predicate (priority
    exclusion standing in for the comment NOT LIKE), then a second grouping
    over the first's counts — the distribution histogram."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q15_SQL = f"""
    with revenue as (
      select l_suppkey as supplier_no, {REV_SQL} as total_revenue
      from lineitem
      where l_shipdate >= timestamp '1996-01-01'
        and l_shipdate <  timestamp '1996-04-01'
      group by l_suppkey
    )
    select s.s_suppkey, s.s_name, r.total_revenue
    from supplier s
    join revenue r on s.s_suppkey = r.supplier_no
    where r.total_revenue = (select max(total_revenue) from revenue)
"""


@register("agg_q15_top_supplier", Q15_SQL)
def agg_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: aggregated revenue view, scalar MAX over it, equality
    back-join — the view computes once and feeds both sides."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q17_SQL = """
    select cast(cast(cast(sum(cast(l.l_extendedprice as decimal(18,4)))
               as decimal(30,6)) as double) / 7.0 as double) as avg_yearly
    from lineitem l
    join part p on p.p_partkey = l.l_partkey
    where p.p_brand = 'Brand#23' and p.p_size <= 5
      and l.l_quantity < (
        select 0.2 * (cast(sum(l2.l_quantity) as double) / count(*))
        from lineitem l2 where l2.l_partkey = p.p_partkey
      )
"""


@register("agg_q17_small_quantity_revenue", Q17_SQL)
def agg_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part AVG threshold (p_size stands in for
    p_container). The average is computed as exact-sum/count in double on
    both engines so the threshold compares identically."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    thresholds = lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            0.2 * (F.sum("l_quantity").cast("double") / F.count("*"))
        ).alias("qty_threshold")
    )
    return (
        lineitem.join(
            F.broadcast(
                part.filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("decimal(30,6)")
                .cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


Q20_SQL = """
    select s.s_suppkey, s.s_name
    from supplier s
    join nation n on n.n_nationkey = s.s_nationkey
    where n.n_name = 'NATION_3'
      and s.s_suppkey in (
        select l.l_suppkey
        from lineitem l
        where l.l_partkey in (
            select p_partkey from part where p_name like 'red%'
          )
          and l.l_shipdate >= timestamp '1996-01-01'
          and l.l_shipdate <  timestamp '1997-01-01'
        group by l.l_suppkey
        having sum(l.l_quantity) > 100
      )
    group by s.s_suppkey, s.s_name
"""


@register("agg_q20_potential_promotion", Q20_SQL)
def agg_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN subqueries — parts by name prefix, suppliers by
    shipped-quantity threshold over those parts, nation-filtered output.
    Both INs decorrelate to semi-joins."""
    supplier, nation, lineitem, part = _t(
        spark, sf_dir, "supplier", "nation", "lineitem", "part"
    )
    parts = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    shippers = (
        lineitem.join(
            F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi"
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(shippers, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("s_suppkey", "s_name")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )


Q21_SQL = """
    select s.s_name, cast(count(*) as bigint) as numwait
    from supplier s
    join lineitem l1 on l1.l_suppkey = s.s_suppkey
    join orders o on o.o_orderkey = l1.l_orderkey
    join nation n on n.n_nationkey = s.s_nationkey
    where o.o_orderstatus = 'F' and n.n_name = 'NATION_9'
      and exists (
        select 1 from lineitem l2
        where l2.l_orderkey = l1.l_orderkey
          and l2.l_suppkey <> l1.l_suppkey
      )
      and not exists (
        select 1 from lineitem l3
        where l3.l_orderkey = l1.l_orderkey
          and l3.l_shipdate > l1.l_shipdate
      )
    group by s.s_name
"""


@register("agg_q21_suppliers_kept_waiting", Q21_SQL)
def agg_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS + NOT EXISTS self-joins on the fact — the supplier
    shipped the order's LAST item (no later shipment exists) on a
    multi-supplier order. Expressed with per-order aggregates instead of
    row-at-a-time correlation: one groupBy computes max(shipdate) and
    supplier count, then equality joins replace both EXISTS."""
    supplier, lineitem, orders, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "nation"
    )
    per_order = lineitem.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.max("l_shipdate").alias("last_ship"),
        F.count_distinct("l_suppkey").alias("n_supps"),
    )
    return (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(per_order, F.col("po_orderkey") == F.col("l_orderkey"))
        .filter((F.col("n_supps") >= 2) & (F.col("l_shipdate") == F.col("last_ship")))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_9")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


Q22_SQL = """
    select c.c_mktsegment,
           cast(count(*) as bigint) as numcust,
           cast(cast(sum(cast(c.c_acctbal as decimal(18,2)))
                as decimal(30,2)) as double) as totacctbal
    from customer c
    where c.c_acctbal > (
        select cast(sum(cast(c2.c_acctbal as decimal(18,2))) as double)
               / count(*)
        from customer c2 where c2.c_acctbal > 0.0
      )
      and not exists (
        select 1 from orders o
        where o.o_custkey = c.c_custkey
          and o.o_orderpriority = '1-URGENT'
      )
    group by c.c_mktsegment
"""


@register("agg_q22_global_sales_opportunity", Q22_SQL)
def agg_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar average filter + NOT EXISTS anti-join (mktsegment
    stands in for the phone-prefix grouping). The average is exact-sum /
    count in double so the cut compares identically across engines."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(30,2)")
            .cast("double")
            .alias("totacctbal"),
        )
    )
