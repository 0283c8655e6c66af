"""Relational operator corpus with DuckDB oracle twins.

Covers SURVEY.md §2.1/2.3/2.4/2.5/2.6 (scans, projections, filters,
distinct/aggregations, set ops, casts) plus the §2.10 gap list (joins,
windows, sort/limit, scalar string/date/math/array/JSON functions). Each
query is idiomatic declarative DataFrame code — Catalyst handles pushdown,
pruning, and join strategy; broadcast hints are explicit where a dimension
table is known-small.

Reference citations: scans S1-S7 (main-daft.py:68, main-polars.py:109,
main-polars-lazy.py:149-165), projections/filters P1-P5 (main-polars.py:113,
main-polars.py:117, query_iceberg_duckdb.py:24-27), distinct A1-A3
(main-polars.py:113, main-ray.py:66), keep-last A4-A5 (upsert.py:44-56,
upsert_parquet-lazy-polars.py:46-56), concat U1-U3 (main-polars-lazy.py:165,
upsert.py:42-53), casts C1-C2 (main-polars-lazy.py:160-162, main-daft.py:133).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from pyiceberg_lakehouse_spark.localdf import local_rows_df
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.functions.exact import davg, dsum
from pyiceberg_lakehouse_spark.registry import register
from pyiceberg_lakehouse_spark.sources.testdata import load_table

DSUM = "cast(sum(cast({x} as decimal(18,4))) as double)"
DAVG = "cast(sum(cast({x} as decimal(18,4))) as double) / cast(count({x}) as double)"


# ---------------------------------------------------------------- scans ----


@register(
    "scan_region",
    "select r_regionkey, r_name from region",
)
def scan_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2/S5: full scan of a small table (spark.read.parquet)."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "scan_glob_schema_enforced",
    "select l_orderkey, l_linenumber, l_quantity from lineitem",
)
def scan_glob_schema_enforced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: glob-pattern multi-file scan with an enforced schema.

    The reference builds one LazyFrame per globbed file, casts each, then
    concats (main-polars-lazy.py:149-165); Spark does all of that in one
    declarative read with an explicit schema.
    """
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS

    df = spark.read.schema(SCHEMAS["lineitem"]).parquet(f"{sf_dir}/lineitem.parquet")
    return df.select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "scan_schema_probe",
    "select column_name from (describe select * from lineitem)",
)
def scan_schema_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13/M7: footer-only schema probe (pq.read_schema, main-daft.py:45)."""
    from pyiceberg_lakehouse_spark.sources.inference import infer_spark_schema

    schema = infer_spark_schema(f"{sf_dir}/lineitem.parquet")
    return local_rows_df(spark, [(f.name,) for f in schema.fields], ["column_name"])


@register(
    "scan_events_ts_bounds",
    "select min(ts) as ts_min, max(ts) as ts_max, count(*) as n from events",
)
def scan_events_ts_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 validation: TIMESTAMP(NANOS) -> micros conversion parity."""
    return load_table(spark, sf_dir, "events").agg(
        F.min("ts").alias("ts_min"), F.max("ts").alias("ts_max"), F.count("*").alias("n")
    )


# ------------------------------------------------- projections / filters ----


@register(
    "proj_columns",
    "select l_orderkey, l_extendedprice from lineitem",
)
def proj_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: column projection — pruned down to two columns at the scan."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@register(
    "filter_eq",
    "select c_custkey, c_name, c_mktsegment from customer where c_mktsegment = 'BUILDING'",
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3: equality filter, pushed to the parquet scan."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "filter_range",
    """
    select l_orderkey, l_linenumber, l_shipdate from lineitem
    where l_shipdate >= timestamp '1996-01-01' and l_shipdate < timestamp '1997-01-01'
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 variant: range predicate on a timestamp column."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@register(
    "filter_compound",
    """
    select o_orderkey, o_orderstatus, o_totalprice from orders
    where (o_orderstatus = 'O' and o_totalprice > 300000.0) or o_orderpriority = '1-URGENT'
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: compound boolean predicate (and/or), still fully pushed down."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 300000.0))
        | (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "filter_in_like",
    """
    select p_partkey, p_brand, p_size from part
    where p_size in (1, 5, 9, 13) and p_brand like 'Brand#1%'
    """,
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 variant: IN-list + LIKE prefix."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").isin(1, 5, 9, 13) & F.col("p_brand").like("Brand#1%")
    ).select("p_partkey", "p_brand", "p_size")


# ---------------------------------------------------------- aggregations ----


# computed products go through DECIMAL FACTORS (not a decimal cast of the
# double product): a double product can land on a .xxxx5 rounding tie where
# Spark (HALF_UP on shortest repr) and DuckDB disagree; decimal x decimal is
# exact in both engines. Source columns have <=2 decimal digits, so their
# scale-4 casts can never tie. The final sum is rescaled to scale 6 (exact:
# the products carry <=6 true decimal digits) so its integer value stays
# below 2^53 — DuckDB converts decimal->double as int/10^s in two roundings,
# which only matches Spark's correctly-rounded conversion when the int part
# converts exactly.
DISC_PRICE = (
    "cast(l_extendedprice as decimal(18,4)) * cast(1 - l_discount as decimal(8,4))"
)
CHARGE = f"{DISC_PRICE} * cast(1 + l_tax as decimal(8,4))"

Q1_SQL = f"""
    select
      l_returnflag, l_linestatus,
      {DSUM.format(x="l_quantity")} as sum_qty,
      {DSUM.format(x="l_extendedprice")} as sum_base_price,
      cast(cast(sum({DISC_PRICE}) as decimal(30,6)) as double) as sum_disc_price,
      cast(cast(sum({CHARGE}) as decimal(30,6)) as double) as sum_charge,
      {DAVG.format(x="l_quantity")} as avg_qty,
      {DAVG.format(x="l_extendedprice")} as avg_price,
      {DAVG.format(x="l_discount")} as avg_disc,
      count(*) as count_order
    from lineitem
    where l_shipdate <= timestamp '2000-12-01'
    group by l_returnflag, l_linestatus
"""


@register("agg_q1_pricing_summary", Q1_SQL)
def agg_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary (SURVEY.md §7 step 1).

    One scan, map-side partial aggregation, tiny shuffle (few groups) — the
    plan Catalyst picks is already the 100 TB plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount")
    ).cast("decimal(8,4)")
    charge = disc_price * (1 + F.col("l_tax")).cast("decimal(8,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("decimal(30,6)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(30,6)").cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_group_orders",
    f"""
    select o_orderpriority,
           count(*) as n_orders,
           cast(min(o_totalprice) as double) as min_price,
           cast(max(o_totalprice) as double) as max_price,
           {DAVG.format(x="o_totalprice")} as avg_price
    from orders group by o_orderpriority
    """,
)
def agg_group_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + count/min/max/avg (§2.10 aggregations)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
            davg("o_totalprice", "avg_price"),
        )
    )


@register("agg_distinct_segments", "select distinct c_mktsegment from customer")
def agg_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3: distinct values of one column (main-polars.py:113)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "agg_count_distinct",
    """
    select count(distinct l_partkey) as n_parts,
           count(distinct l_suppkey) as n_supps,
           count(*) as n_rows
    from lineitem
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 + count_distinct (§2.10)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_rollup",
    """
    select l_returnflag, l_linestatus, count(*) as n
    from lineitem group by rollup(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (§2.10)."""
    return load_table(spark, sf_dir, "lineitem").rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n")
    )


@register(
    "agg_cube",
    """
    select o_orderstatus, o_orderpriority, count(*) as n
    from orders group by cube(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (§2.10)."""
    return load_table(spark, sf_dir, "orders").cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )


@register(
    "agg_keep_last",
    """
    select user_id, event_id, event_type, value from (
      select user_id, event_id, event_type, value,
             row_number() over (partition by user_id order by ts desc, event_id desc) as rn
      from events
    ) where rn = 1
    """,
)
def agg_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5: keyed keep-last — the reference's upsert-dedup primitive.

    The reference relies on file order for "last" (upsert.py:53); we order
    explicitly by (ts, event_id) so the result is deterministic (SURVEY.md
    §7 hard-part 1).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "agg_approx_distinct",
    """
    select count(distinct l_partkey) as exact_parts, true as within_bound
    from lineitem
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct with a SELF-CHECKING contract.

    The HLL estimate itself is engine-specific (no bitwise oracle exists),
    so the query emits the exact distinct count plus an in-query assertion
    that the sketch landed within its configured 2% rsd (bound checked at
    5%). DuckDB's twin computes the same exact count and a literal true —
    a wrong estimate OR a wrong exact count flips the hash."""
    agg = load_table(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("_est"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "exact_parts",
        (
            F.abs(F.col("_est") - F.col("exact_parts"))
            / F.col("exact_parts")
            < F.lit(0.05)
        ).alias("within_bound"),
    )


# ------------------------------------------------------------------ joins ----


@register(
    "join_inner_agg",
    f"""
    select c.c_mktsegment,
           count(*) as n_orders,
           {DSUM.format(x="o.o_totalprice")} as revenue
    from orders o join customer c on o.o_custkey = c.c_custkey
    group by c.c_mktsegment
    """,
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregation.

    No broadcast hint: customer SCALES with the dataset (1.5M rows/TB-ish),
    so pinning a broadcast would break at 100 TB. AQE broadcasts it at
    runtime whenever the built side is actually small."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


@register(
    "join_left_count",
    """
    select c.c_custkey, count(o.o_orderkey) as n_orders
    from customer c left join orders o on o.o_custkey = c.c_custkey
    group by c.c_custkey
    """,
)
def join_left_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    """
    select c_custkey, c_name from customer c
    where exists (select 1 from orders o
                  where o.o_custkey = c.c_custkey and o.o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    """
    select c_custkey, c_name from customer c
    where not exists (select 1 from orders o
                      where o.o_custkey = c.c_custkey and o.o_orderstatus = 'P')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast_parts",
    f"""
    select p.p_brand,
           count(*) as n_items,
           {DSUM.format(x="l.l_extendedprice")} as revenue
    from lineitem l join part p on l.l_partkey = p.p_partkey
    group by p.p_brand
    """,
)
def join_broadcast_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x pre-reduced dimension: project part down to (key, brand)
    before the join so the build side is as small as possible; the hint is
    left to AQE because part scales with the dataset."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice", "revenue"))
    )


@register(
    "join_multiway_revenue",
    f"""
    select r.r_name,
           count(*) as n_orders,
           {DSUM.format(x="o.o_totalprice")} as revenue
    from orders o
    join customer c on o.o_custkey = c.c_custkey
    join nation n on c.c_nationkey = n.n_nationkey
    join region r on n.n_regionkey = r.r_regionkey
    group by r.r_name
    """,
)
def join_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table star join (TPC-H Q5 shape).

    nation (25 rows) and region (5 rows) are BOUNDED — broadcast hints are
    correct at any scale. customer scales, so its join strategy is left to
    AQE (shuffle join at 100 TB, runtime broadcast at small sf)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


@register(
    "join_range",
    """
    select p.p_brand, count(*) as n
    from lineitem l
    join part p on l.l_partkey = p.p_partkey
               and l.l_quantity between p.p_size - 2 and p.p_size + 2
    group by p.p_brand
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join condition."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 2)
        & (li.l_quantity <= p.p_size + 2)
    )
    # equi-key anchors the hash join; the range terms ride along as the
    # join condition (no nested-loop). part scales, so no broadcast pin.
    return li.join(p, cond).groupBy("p_brand").agg(F.count("*").alias("n"))


@register(
    "join_asof",
    """
    select p.event_id, p.user_id,
           (select c.event_id from events c
            where c.user_id = p.user_id and c.event_type = 'click'
              and (c.ts < p.ts or (c.ts = p.ts and c.event_id < p.event_id))
            order by c.ts desc, c.event_id desc limit 1) as click_event_id
    from events p where p.event_type = 'purchase'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest earlier click.

    Implemented the scalable way — union + single window pass, one shuffle
    on user_id — not a per-row correlated lookup (which is what the oracle
    uses, fine at sf0.01, quadratic at 100 TB).
    """
    from pyiceberg_lakehouse_spark.operators.asof import asof_join_events

    ev = load_table(spark, sf_dir, "events")
    return asof_join_events(
        ev,
        left_type="purchase",
        right_type="click",
        key="user_id",
        ts_col="ts",
        id_col="event_id",
    )


# ---------------------------------------------------------------- windows ----


@register(
    "win_topk_per_group",
    """
    select o_custkey, o_orderkey, rn from (
      select o_custkey, o_orderkey,
             row_number() over (partition by o_custkey
                                order by o_totalprice desc, o_orderkey) as rn
      from orders
    ) where rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (rank window + filter)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@register(
    "win_lag_lead",
    """
    select event_id, user_id,
           lag(value) over (partition by user_id order by ts, event_id) as prev_value,
           lead(value) over (partition by user_id order by ts, event_id) as next_value
    from events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over per-user event sequences."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "win_running_sum",
    """
    select o_custkey, o_orderkey,
           cast(sum(cast(o_totalprice as decimal(18,4)))
                over (partition by o_custkey order by o_orderdate, o_orderkey) as double)
             as running_spend
    from orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (exact decimal accumulation)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "win_rank_dense",
    """
    select p_partkey, p_brand,
           rank() over (partition by p_brand order by p_retailprice) as rnk,
           dense_rank() over (partition by p_brand order by p_retailprice) as drnk
    from part
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank with real ties."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    return p.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# ------------------------------------------------------------ sort / limit ----


@register(
    "sort_topk_global",
    """
    select o_orderkey, o_totalprice from orders
    order by o_totalprice desc, o_orderkey limit 10
    """,
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (no full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "sort_multi_limit",
    """
    select l_orderkey, l_linenumber, l_shipdate from lineitem
    order by l_shipdate, l_orderkey, l_linenumber limit 100
    """,
)
def sort_multi_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit with a fully deterministic key."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


# ----------------------------------------------------------------- set ops ----


@register(
    "set_intersect",
    """
    select o_custkey from orders where o_orderstatus = 'O'
    intersect
    select o_custkey from orders where o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    """
    select o_custkey from orders where o_orderstatus = 'O'
    except
    select o_custkey from orders where o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)


@register(
    "set_union_all",
    """
    select 'click' as src, event_id from events where event_type = 'click'
    union all
    select 'purchase' as src, event_id from events where event_type = 'purchase'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2/U3: UNION ALL (pl.concat / pa.concat_tables / pd.concat)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        F.lit("click").alias("src"), "event_id"
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("src"), "event_id"
    )
    return a.unionByName(b)


# ------------------------------------------------------------ scalar funcs ----


@register(
    "fn_string",
    """
    select c_custkey,
           upper(c_name) as name_upper,
           substring(c_name, 1, 9) as name_prefix,
           regexp_extract(c_name, '([0-9]+)', 1) as name_digits,
           cast(length(c_name) as integer) as name_len
    from customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: upper/substring/regexp_extract/length."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "fn_datetime",
    f"""
    select cast(date_trunc('month', o_orderdate) as timestamp) as order_month,
           cast(year(o_orderdate) as integer) as order_year,
           count(*) as n,
           {DSUM.format(x="o_totalprice")} as revenue
    from orders
    group by 1, 2
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / year + monthly aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
            "o_totalprice",
        )
        .groupBy("order_month", "order_year")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "revenue"))
    )


@register(
    "fn_math",
    """
    select l_orderkey, l_linenumber,
           sqrt(l_quantity) as qty_sqrt,
           abs(l_discount - 0.05) as disc_dev,
           cast(floor(l_discount * 100) as bigint) as disc_pct,
           cast(ceil(l_tax * 100) as bigint) as tax_pct,
           l_orderkey % 7 as key_mod
    from lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalars (sqrt is IEEE correctly-rounded, so exact parity)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "fn_array",
    """
    select vec_id,
           cast(len(embedding) as integer) as dim,
           cast(embedding[1] as double) as e0,
           cast(embedding[2] as double) as e1,
           label
    from embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column (size + element access)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("e0"),
        F.col("embedding").getItem(1).cast("double").alias("e1"),
        "label",
    )


@register(
    "fn_json",
    f"""
    select cast(props->>'$.k' as integer) % 10 as k_bucket,
           count(*) as n,
           {DSUM.format(x="value")} as sum_value
    from events
    group by 1
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"), "value"
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


@register(
    "fn_case_when",
    """
    select case when o_totalprice < 100000 then 'small'
                when o_totalprice < 300000 then 'medium'
                else 'large' end as bucket,
           count(*) as n
    from orders group by 1
    """,
)
def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


@register(
    "fn_listagg",
    """
    select c_nationkey,
           string_agg(cast(c_custkey as varchar), ',' order by c_custkey) as custkeys
    from customer group by c_nationkey
    """,
)
def fn_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (collect_list + sort_array ≡ string_agg)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list("c_custkey")), lambda x: x.cast("string")),
            ",",
        ).alias("custkeys")
    )


# ------------------------------------------------------------------- casts ----


@register(
    "cast_columns",
    """
    select l_orderkey,
           cast(l_linenumber as varchar) as linenumber_str,
           cast(cast(l_quantity as decimal(12,2)) as double) as qty_dec,
           cast(l_partkey as integer) as partkey_int
    from lineitem
    """,
)
def cast_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C4: per-column casts (main-polars-lazy.py:160-162)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("string").alias("linenumber_str"),
        F.col("l_quantity").cast("decimal(12,2)").cast("double").alias("qty_dec"),
        F.col("l_partkey").cast("int").alias("partkey_int"),
    )


@register(
    "cast_whole_table",
    """
    select cast(c_custkey as bigint) as c_custkey,
           cast(c_name as varchar) as c_name,
           cast(c_nationkey as integer) as c_nationkey,
           cast(cast(c_acctbal as decimal(18,2)) as double) as c_acctbal,
           cast(c_mktsegment as varchar) as c_mktsegment
    from customer
    """,
)
def cast_whole_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: whole-table strict cast to a canonical schema (main-daft.py:133)."""
    from pyiceberg_lakehouse_spark.sources.ingest import strict_cast
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS

    c = strict_cast(load_table(spark, sf_dir, "customer"), SCHEMAS["customer"])
    return c.withColumn("c_acctbal", F.col("c_acctbal").cast("decimal(18,2)").cast("double"))
