"""Third relational batch: outer joins, struct construction/access, null
handling, conditional expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.registry import register
from pyiceberg_lakehouse_spark.sources.testdata import load_table


@register(
    "join_full_outer",
    """
    select a.o_custkey as cust_o, b.o_custkey as cust_f,
           a.n as n_open, b.n as n_finished
    from (select o_custkey, count(*) as n from orders where o_orderstatus = 'O' group by 1) a
    full outer join
         (select o_custkey, count(*) as n from orders where o_orderstatus = 'F' group by 1) b
      on a.o_custkey = b.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with non-matching rows on both sides."""
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .select(F.col("o_custkey").alias("cust_o"), F.col("n").alias("n_open"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .select(F.col("o_custkey").alias("cust_f"), F.col("n").alias("n_finished"))
    )
    return a.join(b, a.cust_o == b.cust_f, "full_outer").select(
        "cust_o", "cust_f", "n_open", "n_finished"
    )


@register(
    "join_right_outer",
    """
    select o.o_orderkey, c.c_custkey, c.c_mktsegment
    from (select * from orders where o_totalprice > 450000) o
    right join customer c on o.o_custkey = c.c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving customers with no qualifying order."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )


@register(
    "fn_struct_ops",
    """
    select s.k as custkey, s.seg as segment, s.bal as balance
    from (
      select struct_pack(k := c_custkey, seg := c_mktsegment, bal := c_acctbal) as s
      from customer where c_acctbal > 0
    )
    """,
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (nested data surface)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    nested = c.select(
        F.struct(
            F.col("c_custkey").alias("k"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_acctbal").alias("bal"),
        ).alias("s")
    )
    return nested.select(
        F.col("s.k").alias("custkey"),
        F.col("s.seg").alias("segment"),
        F.col("s.bal").alias("balance"),
    )


@register(
    "fn_null_handling",
    """
    select o_orderkey,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') as status_resolved,
           greatest(o_totalprice, 250000.0) as price_floor,
           least(o_totalprice, 250000.0) as price_cap,
           o_totalprice is null as price_missing
    from orders
    """,
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least / IS NULL."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_resolved"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("price_floor"),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("price_cap"),
        F.col("o_totalprice").isNull().alias("price_missing"),
    )


@register(
    "scan_repartition_blocks",
    "select 4 as n_partitions, count(*) as n from lineitem",
)
def scan_repartition_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: explicit block-count scan (ray.data override_num_blocks=4,
    main-ray.py:62) == repartition(4); row count is unchanged and the
    partition count is observable."""
    df = load_table(spark, sf_dir, "lineitem").repartition(4)
    n_parts = df.rdd.getNumPartitions()
    return df.agg(
        F.lit(n_parts).alias("n_partitions"), F.count("*").alias("n")
    )


Q3_SQL = """
    select l_orderkey,
           cast(sum(cast(l_extendedprice as decimal(18,4))
                    * cast(1 - l_discount as decimal(8,4))) as double) as revenue,
           o_orderdate, o_orderpriority
    from customer c
    join orders o on c.c_custkey = o.o_custkey
    join lineitem l on l.l_orderkey = o.o_orderkey
    where c.c_mktsegment = 'BUILDING'
      and o.o_orderdate < timestamp '1998-01-01'
      and l.l_shipdate > timestamp '1998-01-01'
    group by l_orderkey, o_orderdate, o_orderpriority
"""


@register("agg_q3_shipping_priority", Q3_SQL)
def agg_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + grouped revenue."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount")
    ).cast("decimal(8,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


Q18_SQL = """
    with big as (
      select l_orderkey from lineitem
      group by l_orderkey having sum(l_quantity) > 150
    )
    select c.c_custkey, o.o_orderkey, o.o_totalprice,
           cast(sum(cast(l.l_quantity as decimal(18,4))) as double) as total_qty
    from orders o
    join big on big.l_orderkey = o.o_orderkey
    join customer c on c.c_custkey = o.o_custkey
    join lineitem l on l.l_orderkey = o.o_orderkey
    group by c.c_custkey, o.o_orderkey, o.o_totalprice
"""


@register("agg_q18_large_orders", Q18_SQL)
def agg_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: semi-join against a grouped-HAVING subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total_qty"))
    )


@register(
    "sample_reservoir",
    """
    select l_orderkey, l_linenumber
    from (
      select l_orderkey, l_linenumber
      from lineitem
      order by md5(concat_ws('#', l_orderkey, l_linenumber, '42'))
      limit 600
    )
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded k-row reservoir sample as a deterministic hash top-k: order
    every row by md5(key, seed) and keep the k smallest. This IS the
    scale-correct distributed reservoir — Spark plans it as
    TakeOrderedAndProject (per-partition top-k heaps, O(k) memory per
    partition, merged once; non-sampled rows never shuffle), the sample
    is uniform over the hash, reproducible under any partitioning, and
    engine-portable (md5 is shared with the oracle), unlike
    engine-seeded Bernoulli RNG which no cross-engine oracle can state.
    Changing the seed literal draws an independent sample."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber")
        .withColumn(
            "_hk",
            F.md5(
                F.concat_ws(
                    "#",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.lit("42"),
                )
            ),
        )
        .orderBy("_hk")
        .limit(600)
        .drop("_hk")
    )


DSUM = "cast(sum(cast({x} as decimal(18,4))) as double)"


@register(
    "join_bloom_reduced",
    f"""
    select n.n_name,
           count(*) as n_items,
           {DSUM.format(x="l.l_extendedprice")} as revenue
    from lineitem l
    join supplier s on l.l_suppkey = s.s_suppkey
    join nation n on s.s_nationkey = n.n_nationkey
    join region r on n.n_regionkey = r.r_regionkey
    where r.r_name = 'EUROPE' and s.s_acctbal > 3000
    group by n.n_name
    """,
)
def join_bloom_reduced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (semi-join) reduction of a fact/dim join
    (operators/joins.py::semi_join_reduce).

    The dim side — European suppliers above a balance floor — is selective
    but SCALES with the dataset, so neither a broadcast of the dim nor a
    collected IN-list survives 100 TB. The reducer broadcasts only the
    ``distinct(pmod(xxhash64(key), m))`` bucket set (≤ 8·m bytes however
    large the dim grows) and drops non-matching lineitem rows map-side,
    BEFORE the join's exchange; bloom false positives are swallowed by the
    real join that follows. Oracle is the plain three-way join — the
    reduction is provably semantics-free.
    """
    from pyiceberg_lakehouse_spark.functions.exact import dsum
    from pyiceberg_lakehouse_spark.operators.joins import semi_join_reduce

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 3000)
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    reduced = semi_join_reduce(li, dim, "l_suppkey", "s_suppkey")
    return (
        reduced.join(dim, reduced.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice", "revenue"),
        )
    )


@register(
    "scan_csv_checked_roundtrip",
    """
    select c_custkey, c_mktsegment, c_acctbal,
           cast(0 as bigint) as n_quarantined
    from customer
    """,
)
def scan_csv_checked_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion with corrupt-record isolation
    (sources/ingest.py::read_csv_checked): customers round-trip through a
    CSV export + PERMISSIVE typed re-read, and two hand-poisoned lines are
    QUARANTINED instead of failing the job or leaking as rows — the bad
    count rides every output row (asserted 2 in-query, hashed as 0
    quarantined-good rows by construction... the oracle states the clean
    table plus the zero-leak flag closed-form)."""
    from pyspark.sql import types as T

    from pyiceberg_lakehouse_spark.sources.ingest import read_csv_checked
    from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    work = session_tmpdir(prefix="csv_ingest_")
    path = f"{work}/cust_csv"
    cust.coalesce(2).write.mode("overwrite").option("header", True).csv(path)
    # poison the drop with a NEW file (appending in place would fight the
    # session's file-status cache): two lines that cannot parse as
    # (bigint, string, double), plus the header the reader expects per file
    with open(f"{path}/poison.csv", "w") as fh:
        fh.write("c_custkey,c_mktsegment,c_acctbal\n")
        fh.write("not_a_number,SEGMENT,xyz\n")
        fh.write("12,OK,extra,columns,here,break,the,schema\n")
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    good, bad = read_csv_checked(spark, path, schema)
    n_bad = bad.count()
    assert n_bad == 2, f"expected 2 quarantined lines, got {n_bad}"
    return good.withColumn("n_quarantined", F.lit(0).cast("long"))


@register(
    "scan_orc_roundtrip",
    """
    select c_custkey, c_mktsegment, c_acctbal
    from customer where c_acctbal > 1000
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source path (Spark's built-in columnar sibling to parquet —
    the Hive-era warehouse format a migration ingests): customers
    round-trip through a zlib ORC export and a typed re-read, and the
    acctbal filter reaches the ORC scan as a pushed predicate
    (asserted on the physical plan IN-QUERY, so the driver row proves
    pushdown, not just values). Avro reads natively since r15
    through the from-scratch container reader (operators/avro.py,
    `scan_avro_roundtrip`) — Spark's own avro DATA SOURCE module stays
    external and uninstalled, but the format no longer gates.
    """
    from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    work = session_tmpdir(prefix="orc_scan_")
    path = f"{work}/cust_orc"
    (
        cust.coalesce(2)
        .write.mode("overwrite")
        .option("compression", "zlib")
        .orc(path)
    )
    out = spark.read.orc(path).filter(F.col("c_acctbal") > 1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_acctbal" in plan.split(
        "PushedFilters"
    )[1][:200], "acctbal predicate did not reach the ORC scan"
    return out


@register(
    "scan_fwf_checked",
    # Orders round-trip through a fixed-width export (10-wide
    # right-aligned key, 1-char status, 14-wide %.2f price, 10-wide
    # ISO date) and the typed re-read; three poisoned lines (short
    # record, non-numeric price, garbage) are QUARANTINED. TPC-H
    # prices are exact 2-decimal values, so the %.2f print -> double
    # parse is bit-stable on both engines.
    """
    select o_orderkey,
           o_orderstatus,
           cast(o_totalprice as double) as price,
           cast(cast(o_orderdate as date) as varchar) as odate,
           cast(0 as bigint) as n_quarantined
    from orders where o_orderkey % 7 = 3
    """,
)
def scan_fwf_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width-field ingestion with per-line validation quarantine
    (sources/ingest.py::read_fwf_checked — the mainframe-export format
    next to the CSV/JSON isolation paths): orders are FORMATTED to
    fixed offsets with pure Column work (lpad/rpad/format_string),
    written as text, re-read through the strict slicer, and three
    hand-poisoned lines (truncated record, alphabetic price, garbage)
    land in quarantine instead of failing the job or leaking as rows.
    The oracle states the clean typed table closed-form."""
    from pyiceberg_lakehouse_spark.sources.ingest import read_fwf_checked
    from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 3)
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
                "o_orderdate")
    )
    lines = orders.select(
        F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 10, " "),
            F.col("o_orderstatus"),
            F.lpad(F.format_string("%.2f", "o_totalprice"), 14, " "),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        ).alias("value")
    )
    work = session_tmpdir(prefix="fwf_ingest_")
    path = f"{work}/orders_fwf"
    lines.coalesce(2).write.mode("overwrite").text(path)
    with open(f"{path}/poison.txt", "w") as fh:
        fh.write("       123O\n")  # truncated record
        fh.write("       456Fnot_a_number 2024-01-01\n")
        fh.write("complete junk line that is long enough to slice\n")
    good, bad = read_fwf_checked(
        spark, path,
        [("o_orderkey", 0, 10, "bigint"),
         ("o_orderstatus", 10, 1, "string"),
         ("price", 11, 14, "double"),
         ("odate", 25, 10, "date")],
    )
    n_bad = bad.count()
    assert n_bad == 3, f"expected 3 quarantined lines, got {n_bad}"
    return good.select(
        "o_orderkey", "o_orderstatus", "price",
        # emitted as the ISO string so both engines hash one type
        F.date_format("odate", "yyyy-MM-dd").alias("odate"),
        F.lit(0).cast("long").alias("n_quarantined"),
    )
