"""Incrementally-maintained rollups (lakehouse/rollup.py).

The scale contract under test: a refresh advances the summary from the
source's snapshot DIFF — the fact table's already-aggregated files are
never reopened — and any history that voids partial merges (deletes,
overwrites, an expired cursor) silently switches to a correct full
recompute, with the mode recorded in the commit summary.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.rollup import (
    create_rollup,
    refresh_rollup,
)
from pyiceberg_lakehouse_spark.sources.testdata import load_table

AGGS = [
    ("l_quantity", "sum"),
    ("*", "count"),
    ("l_extendedprice", "min"),
    ("l_extendedprice", "max"),
]
DIMS = ["l_returnflag", "l_linestatus"]


def _direct(df):
    rows = (
        df.groupBy(*DIMS)
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    )
    return {(r[0], r[1]): (r.s, r.c, r.mn, r.mx) for r in rows}


def _state(rollup):
    rows = rollup.scan().collect()
    return {
        (r.l_returnflag, r.l_linestatus): (
            r.sum_l_quantity,
            r.cnt_rows,
            r.min_l_extendedprice,
            r.max_l_extendedprice,
        )
        for r in rows
    }


def test_rollup_incremental_merge_and_fallbacks(spark, sf_dir, warehouse):
    li = load_table(spark, sf_dir, "lineitem")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.fact", li.schema)
    t.append(li.filter(F.col("l_orderkey") % 2 == 0))
    r = create_rollup(lh, t, "ns.fact_ru", DIMS, AGGS)
    assert _state(r) == _direct(t.scan())

    # append-only delta -> incremental merge, exact vs from-scratch
    t.append(li.filter(F.col("l_orderkey") % 2 == 1))
    res = refresh_rollup(r, t)
    assert res["mode"] == "incremental"
    assert _state(r) == _direct(li)
    assert r.log.snapshots[-1].summary["rollup.mode"] == "incremental"

    # no new snapshot -> noop, no commit
    head = r.log.current_snapshot_id()
    assert refresh_rollup(r, t)["mode"] == "noop"
    assert r.log.current_snapshot_id() == head

    # merge-on-read delete voids partial merging -> full recompute, exact
    t.delete_keys(
        li.filter(F.col("l_orderkey") % 7 == 0).select("l_orderkey"),
        ["l_orderkey"],
    )
    res = refresh_rollup(r, t)
    assert res["mode"] == "full"
    assert _state(r) == _direct(t.scan())
    assert r.log.snapshots[-1].summary["rollup.mode"] == "full"


def test_rollup_incremental_never_reopens_base_files(spark, sf_dir, warehouse):
    """The 100 TB property, enforced physically: rename the base data files
    away after the initial build — an incremental refresh still succeeds
    (its plan touches only the DELTA files plus the small summary table),
    while a full recompute over the same state would have to fail."""
    li = load_table(spark, sf_dir, "lineitem")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.fact_phys", li.schema)
    t.append(li.filter(F.col("l_orderkey") % 2 == 0))
    r = create_rollup(lh, t, "ns.fact_phys_ru", DIMS, AGGS)
    expected = _direct(li)  # compute BEFORE hiding the base files

    base_files = [f["path"] for f in t.log.live_files()]
    for p in base_files:
        os.rename(p, p + ".hidden")
    try:
        t.append(li.filter(F.col("l_orderkey") % 2 == 1))
        assert refresh_rollup(r, t)["mode"] == "incremental"
        assert _state(r) == expected
    finally:
        for p in base_files:
            os.rename(p + ".hidden", p)


def test_rollup_rejects_unmergeable_aggregates(spark, sf_dir, warehouse):
    li = load_table(spark, sf_dir, "lineitem")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.fact_bad", li.schema)
    t.append(li.limit(10))
    with pytest.raises(ValueError, match="unsupported rollup aggregate"):
        create_rollup(lh, t, "ns.bad_ru", DIMS, [("l_quantity", "median")])


def test_rollup_avg_stddev_incremental_equals_full(spark, tmp_path):
    """avg/stddev are stored as mergeable psum/psumsq/pcnt parts; after an
    incremental refresh the DERIVED columns must exactly equal a
    from-scratch computation with the same formula — including NULL
    measures (excluded from pcnt, so they never skew the denominator)."""
    import math
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    rows = [
        (i, "g" + str(i % 3), float(i % 11) if i % 5 else None)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.avgfact", df.schema)
    t.append(df.filter(F.col("id") < 100))
    r = create_rollup(
        lh,
        t,
        "ns.avgfact_ru",
        ["g"],
        [("*", "count"), ("v", "avg"), ("v", "stddev")],
    )
    t.append(df.filter(F.col("id") >= 100))
    assert refresh_rollup(r, t)["mode"] == "incremental"

    got = {x.g: (x.cnt_rows, x.avg_v, x.stddev_v) for x in read_rollup(r).collect()}

    # from-scratch with the identical decomposition formula
    import statistics

    by_g: dict[str, list[float]] = {}
    n_rows: dict[str, int] = {}
    for _i, g, v in rows:
        n_rows[g] = n_rows.get(g, 0) + 1
        if v is not None:
            by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        cnt, avg, sd = got[g]
        assert cnt == n_rows[g]
        assert avg == sum(vals) / len(vals)  # exact: integer-valued doubles
        s, ss, n = sum(vals), sum(v * v for v in vals), float(len(vals))
        assert sd == math.sqrt((ss - s * s / n) / (n - 1.0))
        # and the formula agrees with textbook sample stddev to fp tolerance
        assert abs(sd - statistics.stdev(vals)) < 1e-9


def test_rollup_avg_singleton_and_empty_groups_null(spark, tmp_path):
    """pcnt==0 -> avg NULL; pcnt==1 -> stddev NULL (never NaN/inf)."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    rows = [(1, "only_null", None), (2, "single", 4.0), (3, "single2", 7.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.edgefact", df.schema)
    t.append(df)
    r = create_rollup(
        lh, t, "ns.edgefact_ru", ["g"], [("v", "avg"), ("v", "stddev")]
    )
    got = {x.g: (x.avg_v, x.stddev_v) for x in read_rollup(r).collect()}
    assert got["only_null"] == (None, None)
    assert got["single"] == (4.0, None)
    assert got["single2"] == (7.0, None)


def test_stream_rollup_restart_converges(spark, sf_dir, warehouse, tmp_path):
    """A restarted streaming query (same checkpoint) must not double-count:
    committed batch ids skip the append and the cursor makes the refresh a
    noop, so the summary converges to the uninterrupted state."""
    from pyiceberg_lakehouse_spark.streaming.lakehouse_io import (
        write_stream_with_rollup,
    )

    # deterministic subset (limit() without order can differ per job)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.fact_stream", li.schema)
    t.append(li.filter(F.col("l_orderkey") % 2 == 0))
    r = create_rollup(lh, t, "ns.fact_stream_ru", DIMS, AGGS)

    feed = str(tmp_path / "feed")
    li.filter(F.col("l_orderkey") % 2 == 1).repartition(2).write.parquet(feed)
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(li.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(feed)
        )
        write_stream_with_rollup(stream, t, r, ckpt).awaitTermination()

    run()
    state1 = _state(r)
    assert state1 == _direct(li)
    run()  # restart over the same checkpoint: everything already committed
    assert _state(r) == state1


def test_rollup_derived_time_bucket_dims(spark, sf_dir, warehouse):
    """Derived (hypertable) dims: the bucket expression runs in the delta
    pass only; merge groups on the materialized bucket column."""
    ev = load_table(spark, sf_dir, "events")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.ev_hb", ev.schema)
    t.append(ev.filter(F.col("event_id") % 2 == 0))
    r = create_rollup(
        lh,
        t,
        "ns.ev_hb_ru",
        ["event_type", ("hour_bucket", "date_trunc('HOUR', ts)")],
        [("*", "count"), ("value", "min"), ("value", "max")],
    )
    t.append(ev.filter(F.col("event_id") % 2 == 1))
    assert refresh_rollup(r, t)["mode"] == "incremental"
    got = {
        (x.event_type, x.hour_bucket): (x.cnt_rows, x.min_value, x.max_value)
        for x in r.scan().collect()
    }
    want = {
        (x[0], x[1]): (x[2], x[3], x[4])
        for x in ev.groupBy(
            "event_type", F.date_trunc("HOUR", "ts").alias("h")
        )
        .agg(F.count(F.lit(1)), F.min("value"), F.max("value"))
        .collect()
    }
    assert got == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["append", "delete", "refresh"]),
            st.integers(2, 9),
        ),
        min_size=1,
        max_size=5,
    )
)
@pytest.mark.slow
def test_rollup_property_any_mutation_sequence(spark, tmp_path, ops):
    """For ANY interleaving of appends, MoR deletes, and refreshes, a final
    refresh leaves the summary equal to a from-scratch aggregate of the
    live table — the incremental/full mode choice is an optimization the
    result can never depend on."""
    import uuid

    rows = [(i, "g" + str(i % 3), float(i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.prop", df.schema)
    t.append(df.filter(F.col("id") < 50))
    r = create_rollup(
        lh, t, "ns.prop_ru", ["g"], [("v", "sum"), ("*", "count"), ("v", "max")]
    )
    hi = 50
    for op, m in ops:
        if op == "append" and hi < 200:
            t.append(df.filter((F.col("id") >= hi) & (F.col("id") < hi + 50)))
            hi += 50
        elif op == "delete":
            t.delete_keys(
                df.filter(F.col("id") % m == 0).select("id"), ["id"]
            )
        else:
            refresh_rollup(r, t)
    refresh_rollup(r, t)
    got = {
        x.g: (x.sum_v, x.cnt_rows, x.max_v) for x in r.scan().collect()
    }
    want = {
        x[0]: (x[1], x[2], x[3])
        for x in t.scan()
        .groupBy("g")
        .agg(F.sum("v"), F.count(F.lit(1)), F.max("v"))
        .collect()
    }
    assert got == want


def test_reaggregate_answers_from_summary_only(spark, sf_dir, warehouse):
    """The continuous-aggregate read path must be servable from summary
    rows alone: hide the fact table's data files after the rollup is
    current — a coarser re-aggregate still answers, and equals the
    from-scratch daily aggregate computed before hiding. avg parts must
    survive two merge levels exactly."""
    from pyiceberg_lakehouse_spark.lakehouse.rollup import reaggregate_rollup

    ev = load_table(spark, sf_dir, "events").withColumn(
        "vf", F.floor("value").cast("long")
    )
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.ra_fact", ev.schema)
    t.append(ev)
    r = create_rollup(
        lh,
        t,
        "ns.ra_ru",
        [("hour_bucket", "date_trunc('HOUR', ts)"), "event_type"],
        [("*", "count"), ("vf", "avg")],
    )
    want = {
        (x[0], x[1]): (x[2], x[3])
        for x in ev.groupBy(
            F.date_trunc("DAY", "ts").alias("d"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            (
                F.sum("vf").cast("double") / F.count("vf").cast("double")
            ).alias("a"),
        )
        .collect()
    }
    fact_files = [f["path"] for f in t.log.live_files()]
    for p in fact_files:
        os.rename(p, p + ".hidden")
    try:
        daily = reaggregate_rollup(
            r, [("day_bucket", "date_trunc('DAY', hour_bucket)"), "event_type"]
        )
        got = {
            (x.day_bucket, x.event_type): (x.cnt_rows, x.avg_vf)
            for x in daily.collect()
        }
    finally:
        for p in fact_files:
            os.rename(p + ".hidden", p)
    assert got == want


def test_rollup_hll_distinct_incremental_equals_full(spark, tmp_path):
    """HLL distinct rollup: after incremental refreshes, the register
    vectors — and therefore the derived estimates — must be BIT-IDENTICAL
    to a from-scratch rollup over the same final fact table (element-wise
    max is order- and batching-insensitive). The estimate must land within
    HLL error of the exact distinct count, NULLs excluded."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    rows = [
        (i, "g" + str(i % 3), (i * 7919) % 500 if i % 17 else None)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, u long")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.hllfact", df.schema)
    t.append(df.filter(F.col("id") < 1000))
    r = create_rollup(
        lh, t, "ns.hllfact_ru", ["g"], [("u", "distinct"), ("*", "count")]
    )
    t.append(df.filter((F.col("id") >= 1000) & (F.col("id") < 2000)))
    assert refresh_rollup(r, t)["mode"] == "incremental"
    t.append(df.filter(F.col("id") >= 2000))
    assert refresh_rollup(r, t)["mode"] == "incremental"

    # from-scratch twin over the same final fact table
    r2 = create_rollup(
        lh, t, "ns.hllfact_ru2", ["g"], [("u", "distinct"), ("*", "count")]
    )
    inc = {x.g: x.hll_u for x in r.scan().collect()}
    full = {x.g: x.hll_u for x in r2.scan().collect()}
    assert inc == full  # registers bit-identical

    est = {x.g: x.distinct_u for x in read_rollup(r).collect()}
    exact = {
        x.g: x.n
        for x in t.scan()
        .groupBy("g")
        .agg(F.count_distinct("u").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(est[g] / n - 1.0) < 0.15, (g, est[g], n)  # ~4.6 sigma


def test_rollup_hll_all_null_group_estimates_zero(spark, tmp_path):
    """A group whose distinct-column values are all NULL stores the empty
    register vector and derives... linear counting of V=m -> ln(1)=0."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", None)],
        "id long, g string, u long",
    )
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.hllnull", df.schema)
    t.append(df)
    r = create_rollup(lh, t, "ns.hllnull_ru", ["g"], [("u", "distinct")])
    got = {x.g: x.distinct_u for x in read_rollup(r).collect()}
    assert got["b"] == 0.0
    assert abs(got["a"] - 2.0) < 0.2


def test_rollup_hll_reaggregate_merges_registers(spark, tmp_path):
    """reaggregate_rollup over an HLL rollup must merge register vectors
    element-wise, so a coarser grouping's estimate equals a direct rollup
    at that grain — union semantics, NOT sum of per-group estimates."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import reaggregate_rollup

    # g pairs share the same users heavily: sum-of-estimates would ~double
    rows = [(i, "g" + str(i % 2), i % 40) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, u long")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.hllre", df.schema)
    t.append(df)
    r = create_rollup(lh, t, "ns.hllre_ru", ["g"], [("u", "distinct")])
    coarse = reaggregate_rollup(r, [("all_", "'x'")]).collect()
    assert len(coarse) == 1
    # 40 distinct users total across both groups (not ~80)
    assert abs(coarse[0]["distinct_u"] / 40.0 - 1.0) < 0.15


@pytest.mark.slow
def test_rollup_percentile_incremental_equals_sort_based(spark, tmp_path):
    """Exact-histogram percentile rollup: after incremental refreshes the
    derived p50/p95 must EQUAL Spark's own sort-based percentile_disc over
    the final fact table — no sketch error — and the count vectors must be
    bit-identical to a from-scratch rollup (element-wise add is order- and
    batching-insensitive)."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    rows = [
        (i, "g" + str(i % 3), (i * 7919) % 50 + 1 if i % 13 else None)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.pctfact", df.schema)
    t.append(df.filter(F.col("id") < 1000))
    mk = lambda ident: create_rollup(  # noqa: E731
        lh,
        t,
        ident,
        ["g"],
        [("*", "count"), ("v", "p50"), ("v", "p95")],
        domains={"v": (1, 50)},
    )
    r = mk("ns.pctfact_ru")
    t.append(df.filter((F.col("id") >= 1000) & (F.col("id") < 2000)))
    assert refresh_rollup(r, t)["mode"] == "incremental"
    t.append(df.filter(F.col("id") >= 2000))
    assert refresh_rollup(r, t)["mode"] == "incremental"

    full = mk("ns.pctfact_ru2")
    assert {x.g: x.hist_v for x in r.scan().collect()} == {
        x.g: x.hist_v for x in full.scan().collect()
    }

    got = {x.g: (x.p50_v, x.p95_v) for x in read_rollup(r).collect()}
    ref = {
        x.g: (x.p50, x.p95)
        for x in t.scan()
        .groupBy("g")
        .agg(
            F.expr(
                "percentile_disc(0.5) within group (order by v)"
            ).alias("p50"),
            F.expr(
                "percentile_disc(0.95) within group (order by v)"
            ).alias("p95"),
        )
        .collect()
    }
    assert got == ref


def test_rollup_percentile_out_of_domain_and_nulls(spark, tmp_path):
    """Out-of-domain and non-integral values land in the sentinel slots
    and force the derived percentile to NULL (never a silently-wrong
    answer); an all-NULL group derives NULL; a clean group still answers.
    A percentile agg without a declared domain is rejected eagerly."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    df = spark.createDataFrame(
        [
            (1, "clean", 5.0),
            (2, "clean", 7.0),
            (3, "high", 99.0),  # > hi
            (4, "frac", 5.5),  # non-integral
            (5, "nulls", None),
        ],
        "id long, g string, v double",
    )
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.pctoob", df.schema)
    t.append(df)
    r = create_rollup(
        lh, t, "ns.pctoob_ru", ["g"], [("v", "p50")], domains={"v": (1, 10)}
    )
    got = {x.g: x.p50_v for x in read_rollup(r).collect()}
    assert got == {"clean": 5, "high": None, "frac": None, "nulls": None}

    with pytest.raises(ValueError, match="domain"):
        create_rollup(lh, t, "ns.pctoob_bad", ["g"], [("v", "p50")])


def test_rollup_percentile_reaggregate_merges_histograms(spark, tmp_path):
    """reaggregate_rollup over a percentile rollup must merge count
    vectors element-wise, so a coarser grouping's percentile equals the
    sort-based percentile at that grain — NOT any combination of
    per-group percentiles."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import reaggregate_rollup

    # skewed per-group distributions so no per-group combination works
    rows = [(i, "lo", 1 + i % 5) for i in range(400)] + [
        (1000 + i, "hi", 40 + i % 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.pctre", df.schema)
    t.append(df)
    r = create_rollup(
        lh, t, "ns.pctre_ru", ["g"], [("v", "p90")], domains={"v": (1, 50)}
    )
    coarse = reaggregate_rollup(r, [("all_", "'x'")]).collect()
    ref = t.scan().agg(
        F.expr("percentile_disc(0.9) within group (order by v)").alias("p")
    ).collect()[0]["p"]
    assert len(coarse) == 1 and coarse[0]["p90_v"] == ref


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["append", "delete", "refresh"]),
            st.integers(2, 9),
        ),
        min_size=1,
        max_size=5,
    )
)
@pytest.mark.slow
def test_rollup_percentile_property_any_mutation_sequence(spark, tmp_path, ops):
    """For ANY interleaving of appends, MoR deletes, and refreshes, a
    final refresh leaves the derived percentiles equal to sort-based
    percentile_disc over the live table — incremental histogram merges
    and full-recompute fallbacks can never change the answer."""
    import uuid

    rows = [(i, "g" + str(i % 3), (i * 13) % 7 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.pctprop", df.schema)
    t.append(df.filter(F.col("id") < 50))
    r = create_rollup(
        lh,
        t,
        "ns.pctprop_ru",
        ["g"],
        [("v", "p25"), ("v", "p50"), ("v", "p99")],
        domains={"v": (1, 7)},
    )
    hi = 50
    for op, m in ops:
        if op == "append" and hi < 200:
            t.append(df.filter((F.col("id") >= hi) & (F.col("id") < hi + 50)))
            hi += 50
        elif op == "delete":
            t.delete_keys(df.filter(F.col("id") % m == 0).select("id"), ["id"])
        else:
            refresh_rollup(r, t)
    refresh_rollup(r, t)
    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    got = {
        x.g: (x.p25_v, x.p50_v, x.p99_v) for x in read_rollup(r).collect()
    }
    want = {
        x[0]: (x[1], x[2], x[3])
        for x in t.scan()
        .groupBy("g")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({q}) within group (order by v)"
                ).alias(f"p{n}")
                for q, n in ((0.25, 25), (0.5, 50), (0.99, 99))
            ]
        )
        .collect()
    }
    assert got == want


def test_rollup_topn_incremental_equals_full_and_exact(spark, tmp_path):
    """topN heavy-hitters rollup: after incremental refreshes the stored
    frequency maps — and the derived top strings — must equal a
    from-scratch rollup AND the exact SQL top-n over the final fact table
    (key-union addition is order/batching-insensitive and, under the cap,
    has no sketch error)."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    rows = [
        (i, "g" + str(i % 3), "v" + str((i * i) % 7) if i % 13 else None)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v string")
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.topfact", df.schema)
    t.append(df.filter(F.col("id") < 1000))
    r = create_rollup(
        lh, t, "ns.topfact_ru", ["g"], [("v", "top3"), ("*", "count")]
    )
    t.append(df.filter(F.col("id") >= 1000))
    assert refresh_rollup(r, t)["mode"] == "incremental"

    r2 = create_rollup(
        lh, t, "ns.topfact_ru2", ["g"], [("v", "top3"), ("*", "count")]
    )
    inc = {x.g: x.freq_v for x in r.scan().collect()}
    full = {x.g: x.freq_v for x in r2.scan().collect()}
    assert inc == full

    got = {x.g: x.top3_v for x in read_rollup(r).collect()}
    truth = (
        t.scan()
        .filter(F.col("v").isNotNull())
        .groupBy("g", "v")
        .count()
        .collect()
    )
    by_g: dict = {}
    for x in truth:
        by_g.setdefault(x.g, []).append((x.v, x["count"]))
    for g, pairs in by_g.items():
        pairs.sort(key=lambda p: (-p[1], p[0]))
        expect = ",".join(f"{v}:{c}" for v, c in pairs[:3])
        assert got[g] == expect, (g, got[g], expect)


def test_rollup_topn_overflow_sentinel_is_sticky(spark, tmp_path):
    """Exceeding the declared cap collapses the group's map to the
    overflow sentinel — the derived topN reads NULL, and the sentinel
    survives later merges (never un-overflows)."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import read_rollup

    df = spark.createDataFrame(
        [(i, "a", "v" + str(i % 5)) for i in range(100)]
        + [(i, "b", "w" + str(i % 2)) for i in range(100)],
        "id long, g string, v string",
    )
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.capfact", df.schema)
    t.append(df)
    r = create_rollup(
        lh, t, "ns.capfact_ru", ["g"], [("v", "top2")],
        freq_caps={"v": 3},
    )
    got = {x.g: x.top2_v for x in read_rollup(r).collect()}
    assert got["a"] is None  # 5 distinct > cap 3 -> honest NULL
    assert got["b"] == "w0:50,w1:50"
    # sticky: appending MORE rows (even low-cardinality ones) never
    # resurrects the overflowed group
    t.append(df.filter(F.col("v") == "v0"))
    assert refresh_rollup(r, t)["mode"] == "incremental"
    got2 = {x.g: x.top2_v for x in read_rollup(r).collect()}
    assert got2["a"] is None
    assert got2["b"] == "w0:50,w1:50"


def test_rollup_topn_tiebreak_and_reaggregate(spark, tmp_path):
    """Count ties order by value ascending (deterministic, hash-safe), and
    a coarser reaggregate derives its topN from merged maps without
    touching the fact table."""
    import uuid

    from pyiceberg_lakehouse_spark.lakehouse.rollup import reaggregate_rollup

    df = spark.createDataFrame(
        [(1, "x", "a", "zz"), (2, "x", "a", "aa"), (3, "x", "b", "aa"),
         (4, "y", "a", "zz"), (5, "y", "b", "zz"), (6, "y", "b", "aa")],
        "id long, g string, h string, v string",
    )
    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    t = lh.create_table("ns.tiefact", df.schema)
    t.append(df)
    r = create_rollup(lh, t, "ns.tiefact_ru", ["g", "h"], [("v", "top1")])
    coarse = {x.g: x.top1_v for x in reaggregate_rollup(r, ["g"]).collect()}
    # g=x: aa x2, zz x1 -> aa:2 ; g=y: tie aa=1? no: zz x2, aa x1 -> zz:2
    assert coarse == {"x": "aa:2", "y": "zz:2"}
    # global reaggregate: aa=3, zz=3 tie -> value-ascending picks aa
    g_all = reaggregate_rollup(r, []).collect()
    assert g_all[0].top1_v == "aa:3"
