"""Second relational corpus batch: pivot, percentiles, grouping sets (SQL
surface), explode, scalar subqueries, HAVING, multiset ops, string/date
functions, schema-evolving unions.

Percentile queries deliberately target integer-valued columns: interpolation
between integers is dyadic-exact, so Spark's and DuckDB's differently-ordered
interpolation formulas produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.registry import register
from pyiceberg_lakehouse_spark.sources.testdata import load_table, register_views

DSUM = "cast(sum(cast({x} as decimal(18,4))) as double)"


@register(
    "agg_pivot",
    """
    select o_orderpriority,
           count(*) filter (where o_orderstatus = 'O') as "O",
           count(*) filter (where o_orderstatus = 'F') as "F",
           count(*) filter (where o_orderstatus = 'P') as "P"
    from orders group by o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on order status (DataFrame pivot ≡ conditional aggregation)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0)
    )


@register(
    "agg_median_percentile",
    """
    select l_returnflag,
           median(l_quantity) as med_qty,
           quantile_cont(l_quantity, 0.25) as q25_qty,
           quantile_cont(l_quantity, 0.75) as q75_qty,
           cast(max(l_quantity) as double) as max_qty
    from lineitem group by l_returnflag
    """,
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median / percentile_cont over integer-valued quantities."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("q25_qty"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )


@register(
    "sql_grouping_sets",
    """
    select n_regionkey, n_nationkey, count(*) as n
    from nation group by grouping sets ((n_regionkey), (n_nationkey), ())
    """,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 + GROUPING SETS: the SQL entry point over registered views."""
    register_views(spark, sf_dir, ("nation",))
    return spark.sql(
        """
        select n_regionkey, n_nationkey, count(*) as n
        from nation group by grouping sets ((n_regionkey), (n_nationkey), ())
        """
    )


@register(
    "fn_explode_tokens",
    """
    select token, count(*) as n from (
      select unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) as token
      from documents
    ) group by token having count(*) >= 100
    """,
)
def fn_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (flatten) + HAVING over the token stream."""
    from pyiceberg_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("token")
    )
    return toks.groupBy("token").agg(F.count("*").alias("n")).filter(F.col("n") >= 100)


@register(
    "filter_scalar_subquery",
    f"""
    select o_orderkey, o_totalprice from orders
    where o_totalprice > 1.5 * (select {DSUM.format(x="o_totalprice")} / count(*) from orders)
    """,
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter against a scalar subquery (1.5x mean price).

    ONE Catalyst plan: the 1-row aggregate broadcast-joins onto the scan —
    no driver-side collect, so the threshold computes inside the same job
    (and the whole thing stays re-optimizable / cacheable as a unit)."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("_avg_price")
    )
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > 1.5 * F.col("_avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "agg_having",
    """
    select o_custkey, count(*) as n_orders from orders
    group by o_custkey having count(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "set_intersect_all",
    """
    select o_custkey from orders where o_orderstatus = 'O'
    intersect all
    select o_custkey from orders where o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    """
    select o_custkey from orders where o_orderstatus = 'O'
    except all
    select o_custkey from orders where o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset semantics)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@register(
    "fn_string_extended",
    """
    select p_partkey,
           replace(p_brand, 'Brand#', 'B') as brand_short,
           lpad(cast(p_size as varchar), 4, '0') as size_padded,
           reverse(p_type) as type_rev,
           split_part(p_type, ' ', 1) as type_head,
           concat(p_brand, '/', p_type) as brand_type
    from part
    """,
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """replace / lpad / reverse / split_part / concat."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_type").alias("type_rev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
    )


@register(
    "fn_date_arithmetic",
    """
    select o_orderkey,
           o_orderdate + interval 30 day as due_date,
           cast(date_diff('day', timestamp '1995-01-01', o_orderdate) as integer) as days_since_epoch_start,
           cast(extract(month from o_orderdate) as integer) as order_month_num,
           cast(extract(dow from o_orderdate) as integer) as order_dow
    from orders
    """,
)
def fn_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic, datediff, extract; note DOW normalization
    (Spark dayofweek is 1=Sunday, DuckDB dow is 0=Sunday)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("interval 30 day")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("days_since_epoch_start"),
        F.month("o_orderdate").alias("order_month_num"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
    )


@register(
    "set_union_missing_columns",
    """
    select c_custkey as entity_id, c_name as name, c_acctbal as balance from customer
    union all
    select s_suppkey as entity_id, s_name as name, cast(null as double) as balance from supplier
    """,
)
def set_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union (unionByName allowMissingColumns)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"), F.col("s_name").alias("name")
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "win_ntile_cume",
    """
    select o_orderkey,
           ntile(4) over (order by o_totalprice, o_orderkey) as quartile,
           cume_dist() over (order by o_totalprice, o_orderkey) as cd
    from orders
    """,
)
def win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + cume_dist global windows (deterministic full ordering)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
    )
