"""Fourth relational batch: bounded window frames, schema-typed JSON
parsing, and the vectorized scalar pandas_udf surface."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyiceberg_lakehouse_spark.registry import register
from pyiceberg_lakehouse_spark.sources.testdata import load_table


@register(
    "win_bounded_frame",
    """
    select o_custkey, o_orderkey,
           cast(sum(cast(o_totalprice as decimal(18,4)))
                over (partition by o_custkey order by o_orderdate, o_orderkey
                      rows between 2 preceding and current row) as double)
             as moving_spend,
           count(*) over (partition by o_custkey order by o_orderdate, o_orderkey
                          rows between 2 preceding and current row) as frame_n
    from orders
    """,
)
def win_bounded_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (moving 3-order sum) — the frame-spec surface the
    unbounded running-sum query doesn't touch."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("moving_spend"),
        F.count("*").over(w).alias("frame_n"),
    )


@register(
    "fn_from_json_struct",
    """
    select event_id, cast(props->>'$.k' as bigint) as k_typed,
           (cast(props->>'$.k' as bigint) is not null) as parsed_ok
    from events
    """,
)
def fn_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-typed JSON parsing (from_json -> struct), complementing the
    path-extraction form in fn_json. Malformed documents yield nulls, not
    errors — the PERMISSIVE contract a 100 TB ingest needs."""
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.select(
        "event_id", F.from_json("props", schema).alias("_p")
    )
    return parsed.select(
        "event_id",
        F.col("_p.k").alias("k_typed"),
        F.col("_p.k").isNotNull().alias("parsed_ok"),
    )


@F.pandas_udf(T.LongType())
def _vowel_count(s: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar UDF: one pandas str-op per batch, no per-row
    Python. Deterministic (regex count), so it oracle-checks exactly."""
    return s.str.lower().str.count("[aeiou]").astype("int64")


@register(
    "fn_pandas_scalar",
    """
    select doc_id,
           cast(length(lower(text)) -
                length(regexp_replace(lower(text), '[aeiou]', '', 'g')) as bigint)
             as n_vowels
    from documents
    """,
)
def fn_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized scalar pandas_udf surface (SURVEY §2.10 UDF row).

    The hot-path guidance stands — builtins beat UDFs — but when Python is
    unavoidable this is the shape: @pandas_udf over Arrow batches, ~10-100x
    a row-at-a-time Python UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _vowel_count(F.col("text")).alias("n_vowels"))


@register(
    "agg_unpivot",
    """
    select o_orderkey, metric, cast(val as double) as val
    from (select o_orderkey,
                 o_totalprice as price,
                 cast(o_custkey as double) as custkey_num
          from orders)
    unpivot (val for metric in (price, custkey_num))
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) — the inverse of agg_pivot."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_custkey").cast("double").alias("custkey_num"),
    )
    return o.unpivot(
        "o_orderkey", ["price", "custkey_num"], "metric", "val"
    ).select("o_orderkey", "metric", F.col("val").cast("double").alias("val"))


@register(
    "filter_exists_correlated",
    """
    select o_orderkey, o_totalprice
    from orders o
    where exists (select 1 from lineitem l
                  where l.l_orderkey = o.o_orderkey and l.l_quantity >= 49)
      and not exists (select 1 from lineitem l
                      where l.l_orderkey = o.o_orderkey and l.l_discount > 0.09)
    """,
)
def filter_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL surface — Catalyst
    rewrites them to semi/anti joins (the same plan the DataFrame forms in
    join_semi/join_anti produce)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_x_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_x_lineitem")
    return spark.sql(
        """
        select o_orderkey, o_totalprice
        from _x_orders o
        where exists (select 1 from _x_lineitem l
                      where l.l_orderkey = o.o_orderkey and l.l_quantity >= 49)
          and not exists (select 1 from _x_lineitem l
                          where l.l_orderkey = o.o_orderkey and l.l_discount > 0.09)
        """
    )


@register(
    "fn_posexplode",
    """
    select doc_id, cast(i - 1 as integer) as pos, tk[i] as tok
    from (select doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t != '') as tk
          from documents) d,
         unnest(generate_series(1, len(d.tk))) as u(i)
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token with its position (lateral-view surface)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
        ).alias("_tk"),
    )
    return toks.select("doc_id", F.posexplode("_tk").alias("pos", "tok")).select(
        "doc_id", "pos", "tok"
    )


@register(
    "fn_grouped_pandas_demean",
    """
    select l_orderkey, l_linenumber, l_returnflag,
           l_quantity - avg(l_quantity) over (partition by l_returnflag)
             as qty_dev
    from lineitem
    """,
)
def fn_grouped_pandas_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (SURVEY §2.10 UDF row): per-group
    demeaning, each group one Arrow-backed pandas frame.

    Bit-exactness argument: l_quantity is integer-valued, so the group sum
    is exact in float64 (< 2^53) in pandas, Spark, and DuckDB alike; the
    single division and subtraction then round identically (IEEE). Avoid
    this pattern for true-float columns — engine mean algorithms differ.
    """
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["l_orderkey", "l_linenumber", "l_returnflag"]].copy()
        qty = pdf["l_quantity"]
        out["qty_dev"] = qty - (float(qty.sum()) / len(qty))
        return out

    return li.groupBy("l_returnflag").applyInPandas(
        demean,
        "l_orderkey long, l_linenumber long, l_returnflag string, qty_dev double",
    )


@register(
    "agg_conditional",
    """
    select o_orderpriority,
           cast(count(*) filter (where o_totalprice > 150000.0) as bigint)
             as n_large,
           bool_and(o_totalprice > 900.0) as all_above_floor,
           bool_or(o_orderstatus = 'P') as any_pending
    from orders group by o_orderpriority
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates: count_if, every (bool_and), any
    (bool_or) per group."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_large"),
        F.every(F.col("o_totalprice") > 900.0).alias("all_above_floor"),
        F.some(F.col("o_orderstatus") == "P").alias("any_pending"),
    )


@register(
    "fn_bitwise",
    """
    select o_orderkey,
           cast(o_orderkey & 255 as bigint) as low_byte,
           cast(o_orderkey << 2 as bigint) as shifted,
           cast(xor(o_orderkey, 12345) as bigint) as xored,
           cast(bit_count(o_orderkey) as integer) as popcount
    from orders where o_orderkey < 500
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: and/shift/xor/popcount."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.shiftleft(F.col("o_orderkey"), 2).alias("shifted"),
        F.col("o_orderkey").bitwiseXOR(F.lit(12345)).alias("xored"),
        F.bit_count(F.col("o_orderkey")).alias("popcount"),
    )


@register(
    "fn_array_higher_order",
    """
    with t as (select doc_id,
                      string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
                        as toks
               from documents where doc_id < 100)
    select doc_id,
           cast(len(list_filter(toks, x -> length(x) > 4)) as integer) as n_long,
           coalesce(array_to_string(list_transform(list_filter(toks, x -> length(x) > 6),
                                                   x -> upper(x)), ' '), '') as long_upper,
           cast(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                            (a, b) -> a + b) as bigint) as total_chars
    from t
    """,
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: filter, transform, aggregate (fold) —
    the Catalyst lambda surface the similarity/dedup operators build on."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    from pyiceberg_lakehouse_spark.operators.dedup import normalize_text

    toks = F.split(normalize_text(F.col("text")), " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.array_join(
            F.transform(
                F.filter(toks, lambda x: F.length(x) > 6), lambda x: F.upper(x)
            ),
            " ",
        ).alias("long_upper"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
    )


@register(
    "ts_gapfill_hourly",
    """
    with bounds as (
      select date_trunc('hour', min(ts)) as lo, date_trunc('hour', max(ts)) as hi
      from events
    ),
    grid as (
      select unnest(generate_series(lo, hi, interval 1 hour)) as hour_start
      from bounds
    ),
    agg as (
      select date_trunc('hour', ts) as hour_start, count(*) as n
      from events group by 1
    )
    select g.hour_start, cast(coalesce(a.n, 0) as bigint) as n
    from grid g left join agg a on g.hour_start = a.hour_start
    """,
)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap filling: a dense hourly grid
    (sequence + explode) left-joined to the hourly counts, zeros where no
    events landed. The grid is generated from one tiny min/max agg — never
    collected — so the pattern scales to any time range."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    ).select(F.col("h").cast("timestamp_ntz").alias("hour_start"))
    agg = ev.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start")
    ).agg(F.count("*").alias("n"))
    return grid.join(agg, "hour_start", "left").select(
        "hour_start", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )


@register(
    "fn_regexp_extract_all",
    """
    select doc_id,
           coalesce(
             array_to_string(regexp_extract_all(lower(text), '[a-z]*ing'), ' '),
             '') as ing_words,
           cast(len(regexp_extract_all(lower(text), '[0-9]+')) as integer)
             as n_numbers
    from documents where doc_id < 200
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: every match (flattened to a string at the query
    edge — the driver's canonicalizer hashes scalars only), plus a match
    count."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    low = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all(low, F.lit("[a-z]*ing")), " "
        ).alias("ing_words"),
        F.size(F.regexp_extract_all(low, F.lit("[0-9]+"))).alias("n_numbers"),
    )


@register(
    "fn_try_arithmetic",
    """
    select o_orderkey,
           o_totalprice / nullif(cast(o_orderkey % 10 as double), 0.0)
             as price_per_bucket,
           try_cast(o_orderpriority as bigint) as prio_num,
           try_cast(substr(o_orderpriority, 1, 1) as bigint) as prio_digit
    from orders where o_orderkey < 2000
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe arithmetic surface: try_divide (null on /0, never an
    error) and try_cast (null on malformed input)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 10).cast("double")
        ).alias("price_per_bucket"),
        F.col("o_orderpriority").try_cast("bigint").alias("prio_num"),
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias("prio_digit"),
    )


@register(
    "events_funnel_steps",
    """
    with per as (
      select user_id, min(case when event_type = 'signup' then ts end) as s
      from events group by user_id
    ),
    c as (
      select e.user_id, min(e.ts) as c
      from events e join per using (user_id)
      where e.event_type = 'click' and e.ts > per.s
      group by e.user_id
    ),
    p as (
      select e.user_id, min(e.ts) as p
      from events e join c using (user_id)
      where e.event_type = 'purchase' and e.ts > c.c
      group by e.user_id
    )
    select (select count(*) from per) as n_users,
           (select count(s) from per) as n_signup,
           (select count(*) from c) as n_click_after_signup,
           (select count(*) from p) as n_purchase_after_click,
           case when (select count(s) from per) > 0
                then cast((select count(*) from p) as double)
                     / (select count(s) from per) end as signup_to_purchase
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered product-analytics funnel: signup -> first click AFTER the
    signup -> first purchase AFTER that click, counted per user. The
    sequencing constraint (each stage strictly after the previous stage's
    timestamp) is what distinguishes a funnel from three filters.

    ONE shuffle on user_id: three same-partition window passes derive the
    per-user stage timestamps (s, c, p) without self-joins — at 100 TB
    this is a single exchange keyed by user, while the equivalent
    join-chain would shuffle the events table three times. The final
    stage-count aggregate reduces to one row.

    Skew note: windows require a user's whole history in one partition,
    so a pathologically hot user (bot traffic) lands on one task and AQE
    cannot split it (skew-join splitting applies to joins, not windows).
    If per-user event counts are heavy-tailed, pre-filter bot users or
    switch to the join-chain formulation: per-user conditional-min
    aggregates combine map-side (hot keys shrink before the shuffle) and
    the subsequent event-to-stage joins are AQE-skew-splittable — three
    shuffles, but each one skew-robust."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    e = ev.withColumn(
        "s",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    e = e.withColumn(
        "c",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("s")),
                F.col("ts"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "p",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c")),
                F.col("ts"),
            )
        ).over(w),
    )
    stages = e.select("user_id", "s", "c", "p").distinct()
    n_signup = F.count("s")
    return stages.agg(
        F.count("user_id").alias("n_users"),
        n_signup.alias("n_signup"),
        F.count("c").alias("n_click_after_signup"),
        F.count("p").alias("n_purchase_after_click"),
        F.when(
            n_signup > 0, F.count("p").cast("double") / n_signup
        ).alias("signup_to_purchase"),
    )


@register(
    "events_retention_cohorts",
    """
    with d as (select user_id, date_trunc('day', ts) as d from events),
    c as (select user_id, min(d) as cohort from d group by user_id)
    select c.cohort,
           cast(date_diff('day', c.cohort, d.d) as integer) as offset_days,
           count(distinct d.user_id) as n_users
    from d join c using (user_id)
    group by 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day (cohort),
    counted distinct on each day-offset they return. Pure integer/date
    arithmetic — exact cross-engine.

    One shuffle on user_id computes each user's cohort via a window (no
    join back against a per-user aggregate — at scale that join would
    shuffle the fact table a second time), then one shuffle for the
    (cohort, offset) count-distinct."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    e = ev.select("user_id", F.date_trunc("DAY", "ts").alias("d")).withColumn(
        "cohort", F.min("d").over(w)
    )
    return (
        e.groupBy(
            "cohort", F.datediff("d", "cohort").alias("offset_days")
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "events_funnel_skewsafe",
    """
    with per as (
      select user_id, min(case when event_type = 'signup' then ts end) as s
      from events group by user_id
    ),
    c as (
      select e.user_id, min(e.ts) as c
      from events e join per using (user_id)
      where e.event_type = 'click' and e.ts > per.s
      group by e.user_id
    ),
    p as (
      select e.user_id, min(e.ts) as p
      from events e join c using (user_id)
      where e.event_type = 'purchase' and e.ts > c.c
      group by e.user_id
    )
    select (select count(*) from per) as n_users,
           (select count(s) from per) as n_signup,
           (select count(*) from c) as n_click_after_signup,
           (select count(*) from p) as n_purchase_after_click,
           case when (select count(s) from per) > 0
                then cast((select count(*) from p) as double)
                     / (select count(s) from per) end as signup_to_purchase
    """,
)
def events_funnel_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-ROBUST funnel formulation (see events_funnel_steps' skew
    note): per-user conditional-min AGGREGATES instead of windows. Each
    stage is a groupBy whose partial aggregation shrinks hot users
    map-side before the shuffle, and each stage-filtering join is
    AQE-skew-splittable — three skew-tolerant shuffles vs the window
    variant's one skew-fragile exchange. Both formulations register
    against the IDENTICAL oracle, so the driver hash proves they agree.

    The per-user stage frames are small (one row per user with a signup).
    No broadcast hint is forced: AQE picks a broadcast join when the stage
    frame's runtime size is under the threshold and degrades to a (skew-
    splittable) shuffle join beyond it — an unconditional hint would OOM
    or fail the job outright on a billion-signed-user frame at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s")
    )
    signed = per.filter(F.col("s").isNotNull())
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(signed, "user_id")
        .filter(F.col("ts") > F.col("s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    counts = per.agg(
        F.count("user_id").alias("n_users"),
        F.count("s").alias("n_signup_"),
    )
    return (
        counts.crossJoin(c.agg(F.count("user_id").alias("n_click_after_signup")))
        .crossJoin(p.agg(F.count("user_id").alias("n_purchase_after_click")))
        .select(
            "n_users",
            F.col("n_signup_").alias("n_signup"),
            "n_click_after_signup",
            "n_purchase_after_click",
            F.when(
                F.col("n_signup_") > 0,
                F.col("n_purchase_after_click").cast("double")
                / F.col("n_signup_"),
            ).alias("signup_to_purchase"),
        )
    )


@register(
    "fn_variant_extract",
    # Spark 4's VARIANT type over semi-structured event payloads — the
    # real training-data shape (API logs, telemetry): parse_json ->
    # variant_get path extraction with typed casts, nested objects,
    # array indexing, the present-null vs absent distinction
    # (is_variant_null), and malformed rows degrading to NULLs via
    # try_parse_json instead of failing the job. Pure JVM — no Python
    # evaluator. The oracle restates every extracted value closed-form
    # from the construction. Filter modulus 13 residue 8.
    """
    with base as (
      select doc_id, cast(doc_id as bigint) as d,
             doc_id % 6 <> 5 as valid
      from documents where doc_id % 13 = 8
    )
    select doc_id,
      case when valid then d end as user_id,
      case when valid then 'u-' || (d % 7) end as user_name,
      case when valid then 'b-' || (d % 5) end as tag1,
      case when valid then cast(d % 7 as double) + 0.25 end as score,
      case when valid then cast(d % 50 as integer) end as cnt,
      cast(case when valid then case when d % 2 = 0 then 1 else 0 end
           end as integer) as flag,
      valid and d % 4 = 0 as extra_is_null,
      valid
    from base
    """,
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction on Spark 4's native VARIANT type —
    the engine-level path for event/API payloads a training pipeline
    ingests: per doc, synthesize a JSON event (nested user object,
    tag array, decimal metric, a present-null vs absent 'extra'
    field, a boolean, and every sixth row MALFORMED), parse with
    try_parse_json (hostile rows become NULL variants, never job
    failures), extract typed fields with variant_get JSON paths
    (nested access, array index) and pin the present-null/absent
    distinction via is_variant_null. All JVM-side Column expressions;
    the oracle restates every value closed-form."""
    d = F.col("doc_id")
    j = F.when(d % 6 == 5, F.lit("not json{{")).otherwise(
        F.concat(
            F.lit('{"user": {"id": '), d,
            F.lit(', "name": "u-'), d % 7,
            F.lit('"}, "tags": ["a-'), d % 3,
            F.lit('", "b-'), d % 5,
            F.lit('", "c"], "metrics": {"score": '), d % 7,
            F.lit('.25, "count": '), d % 50,
            F.lit("}"),
            F.when(d % 4 == 0, F.lit(', "extra": null')).otherwise(
                F.lit("")
            ),
            F.lit(', "flag": '),
            F.when(d % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
            F.lit("}"),
        )
    )
    return (
        load_table(spark, sf_dir, "documents")
        .filter(d % 13 == 8)
        .select("doc_id", F.try_parse_json(j).alias("v"))
        .select(
            "doc_id",
            F.variant_get("v", "$.user.id", "bigint").alias("user_id"),
            F.variant_get("v", "$.user.name", "string").alias("user_name"),
            F.variant_get("v", "$.tags[1]", "string").alias("tag1"),
            F.variant_get("v", "$.metrics.score", "double").alias("score"),
            F.variant_get("v", "$.metrics.count", "int").alias("cnt"),
            F.variant_get("v", "$.flag", "boolean")
            .cast("int")
            .alias("flag"),
            F.is_variant_null(
                F.variant_get("v", "$.extra", "variant")
            ).alias("extra_is_null"),
            F.col("v").isNotNull().alias("valid"),
        )
    )


@register(
    "graph_pagerank",
    # Link-graph PageRank for crawl curation (the harmonic-centrality
    # style signal Common Crawl publishes), made EXACTLY verifiable:
    # with ranks scaled by 60^k the damped update r' = 0.15 +
    # (0.85/3) * sum(in) becomes the INTEGER recurrence
    # R' = 9*60^k + 17 * sum(in-R) (out-degree fixed at 3, multi-edges
    # kept), so five supersteps produce bigints both engines hash
    # identically — no float-order tolerance anywhere. Rank mass is
    # conserved (sum R_k = 60^k * N), bounding values far below int64.
    """
    with n as (select count(*) as c from documents),
    edges as (
      select doc_id as src, (3*doc_id + 1) % (select c from n) as dst
      from documents
      union all
      select doc_id, (5*doc_id + 2) % (select c from n) from documents
      union all
      select doc_id, (7*doc_id + 3) % (select c from n) from documents
    ),
    r0 as (select doc_id as nid, cast(1 as bigint) as v from documents),
    r1 as (
      select d.doc_id as nid, cast(9 + 17 * coalesce(s.t, 0) as bigint) as v
      from documents d left join (
        select e.dst as nid, sum(r.v) as t
        from edges e join r0 r on e.src = r.nid group by e.dst) s
      on d.doc_id = s.nid
    ),
    r2 as (
      select d.doc_id as nid,
             cast(540 + 17 * coalesce(s.t, 0) as bigint) as v
      from documents d left join (
        select e.dst as nid, sum(r.v) as t
        from edges e join r1 r on e.src = r.nid group by e.dst) s
      on d.doc_id = s.nid
    ),
    r3 as (
      select d.doc_id as nid,
             cast(32400 + 17 * coalesce(s.t, 0) as bigint) as v
      from documents d left join (
        select e.dst as nid, sum(r.v) as t
        from edges e join r2 r on e.src = r.nid group by e.dst) s
      on d.doc_id = s.nid
    ),
    r4 as (
      select d.doc_id as nid,
             cast(1944000 + 17 * coalesce(s.t, 0) as bigint) as v
      from documents d left join (
        select e.dst as nid, sum(r.v) as t
        from edges e join r3 r on e.src = r.nid group by e.dst) s
      on d.doc_id = s.nid
    ),
    r5 as (
      select d.doc_id as nid,
             cast(116640000 + 17 * coalesce(s.t, 0) as bigint) as v
      from documents d left join (
        select e.dst as nid, sum(r.v) as t
        from edges e join r4 r on e.src = r.nid group by e.dst) s
      on d.doc_id = s.nid
    )
    select nid as doc_id, v as rank_scaled from r5
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph PageRank (five Pregel-style supersteps as join +
    aggregate rounds) over a deterministic 3-out-degree graph on the
    documents table — the crawl-curation ranking signal. EXACT:
    scaling ranks by 60^k turns the damped float update into a pure
    integer recurrence (R' = 9*60^k + 17*sum of in-neighbor R), so
    the result hashes bit-identically against the oracle's unrolled
    CTE chain with no float tolerance. Node count is one bounded
    metadata-style count() (the only driver-side scalar); each
    superstep is one shuffle on the edge list — the standard
    iterative-graph shape, linear in |E| per step at any scale.
    Dangling mass is absent by construction (every node has exactly 3
    out-edges, multi-edges kept and counted)."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("nid")
    )
    n = docs.count()  # bounded scalar: the node count
    edges = None
    for a, b in ((3, 1), (5, 2), (7, 3)):
        e = docs.select(
            F.col("nid").alias("src"),
            ((F.col("nid") * a + b) % F.lit(n)).alias("dst"),
        )
        edges = e if edges is None else edges.unionAll(e)
    ranks = docs.select("nid", F.lit(1).cast("long").alias("v"))
    base = 9
    for _k in range(5):
        contrib = (
            edges.join(ranks, edges.src == ranks.nid)
            .groupBy("dst")
            .agg(F.sum("v").alias("t"))
        )
        ranks = (
            docs.join(contrib, docs.nid == contrib.dst, "left")
            .select(
                "nid",
                (
                    F.lit(base)
                    + F.lit(17) * F.coalesce(F.col("t"), F.lit(0))
                ).cast("long").alias("v"),
            )
        )
        base *= 60
    return ranks.select(
        F.col("nid").alias("doc_id"), F.col("v").alias("rank_scaled")
    )


@register(
    "fn_uri_parse",
    # Planted RFC 3986 URIs per doc, decomposed by the spec's own
    # appendix-B regex as PURE Column expressions (functions/urls.py
    # parse_uri + percent_decode — no Python evaluator, plan-pinned in
    # tests/test_plans.py). The oracle restates every component from
    # the same knobs: scheme %3, optional userinfo %4==1, host %10,
    # optional port %5<2, percent-escaped path segment %2, optional
    # query %3>0, optional fragment %4==2.
    """
    with docs as (
      select doc_id, cast(doc_id as bigint) as d
      from documents where doc_id % 23 = 7
    )
    select doc_id,
           case cast(d % 3 as integer) when 0 then 'http'
                when 1 then 'https' else 'ftp' end as scheme,
           case when d % 4 = 1 then 'u' || (d % 7) end as userinfo,
           'h' || (d % 10) || '.example.com' as host,
           cast(case when d % 5 < 2 then 8000 + d % 100 end
                as integer) as port,
           '/p' || (d % 6) || case when d % 2 = 1 then '/x%20y'
                                   else '' end as path,
           case when d % 3 > 0 then 'a=' || (d % 9) || '&b=2' end
               as query,
           case when d % 4 = 2 then 's' || (d % 11) end as fragment,
           '/p' || (d % 6) || case when d % 2 = 1 then '/x y'
                                   else '' end as decoded_path
    from docs
    """,
)
def fn_uri_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3986 URI decomposition, pure JVM (functions/urls.py
    parse_uri — the appendix-B reference regex + authority split — and
    percent_decode, the split/transform/conv/char escape decoder): per
    doc, a URI is ASSEMBLED from knob-driven components (optional
    userinfo/port/query/fragment so every presence combination
    appears), then parsed back; the oracle states each component
    closed-form, so any slip in the regex group numbering, the
    authority split or the %XX decode flips the hash. Zero Python in
    the plan: the crawl-pipeline companion to text_url_canonicalize."""
    from pyiceberg_lakehouse_spark.functions.urls import (
        parse_uri,
        percent_decode,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 23 == 7)
        .select("doc_id", F.col("doc_id").cast("long").alias("d"))
    )
    d = F.col("d")
    uri = F.concat(
        F.when(d % 3 == 0, F.lit("http"))
        .when(d % 3 == 1, F.lit("https"))
        .otherwise(F.lit("ftp")),
        F.lit("://"),
        F.when(d % 4 == 1, F.concat(F.lit("u"), (d % 7).cast("string"),
                                    F.lit("@"))).otherwise(F.lit("")),
        F.lit("h"), (d % 10).cast("string"), F.lit(".example.com"),
        F.when(d % 5 < 2, F.concat(F.lit(":"),
                                   (d % 100 + 8000).cast("string")))
        .otherwise(F.lit("")),
        F.lit("/p"), (d % 6).cast("string"),
        F.when(d % 2 == 1, F.lit("/x%20y")).otherwise(F.lit("")),
        F.when(d % 3 > 0, F.concat(F.lit("?a="), (d % 9).cast("string"),
                                   F.lit("&b=2"))).otherwise(F.lit("")),
        F.when(d % 4 == 2, F.concat(F.lit("#s"), (d % 11).cast("string")))
        .otherwise(F.lit("")),
    )
    parts = parse_uri(uri)
    return docs.select(
        "doc_id",
        parts["scheme"].alias("scheme"),
        parts["userinfo"].alias("userinfo"),
        parts["host"].alias("host"),
        parts["port"].alias("port"),
        parts["path"].alias("path"),
        parts["query"].alias("query"),
        parts["fragment"].alias("fragment"),
        percent_decode(parts["path"]).alias("decoded_path"),
    )
