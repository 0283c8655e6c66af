"""Streaming batch-equivalence + custom stateful operator + sessionization."""

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.sources.testdata import load_table
from pyiceberg_lakehouse_spark.streaming import windows as W
from pyiceberg_lakehouse_spark.streaming.sessions import sessionize
from pyiceberg_lakehouse_spark.streaming.stateful import user_running_totals


def test_tumbling_equals_batch_groupby(spark, sf_dir):
    ev_stream = W.events_stream(spark, sf_dir)
    got = {
        r.window_start: r.n
        for r in W.run_to_memory(W.tumbling_counts(ev_stream), "complete")
        .select("window_start", "n")
        .collect()
    }
    ev_batch = load_table(spark, sf_dir, "events")
    want = {
        r.h: r.n
        for r in ev_batch.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("h")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stateful_running_totals_counts(spark, sf_dir):
    ev = W.events_stream(spark, sf_dir).select("user_id", "value")
    out = W.run_to_memory(user_running_totals(ev), "update")
    got = {r.user_id: r.n_events for r in out.collect()}
    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_sessionize_covers_all_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(ev, gap="30 minutes")
    assert sessions.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # session starts are ordered within user and >=30min apart
    rows = sessions.orderBy("user_id", "session_start").collect()
    prev = {}
    for r in rows:
        if r.user_id in prev:
            assert (r.session_start - prev[r.user_id]).total_seconds() >= 1800
        prev[r.user_id] = r.session_start


def test_salted_groupby_equals_plain(spark, sf_dir):
    from pyiceberg_lakehouse_spark.operators.skew import salted_groupby

    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_groupby(
        li,
        keys=["l_returnflag"],
        aggs=[F.count("*").alias("_n")],
        reaggs=[F.sum("_n").alias("n")],
        n_salts=8,
    )
    plain = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    assert {(r.l_returnflag, r.n) for r in salted.collect()} == {
        (r.l_returnflag, r.n) for r in plain.collect()
    }


def test_stream_session_windows_equals_batch(spark, sf_dir):
    """Append-mode streaming sessionization (watermark-finalized via the
    horizon sentinels) emits exactly the batch session set — same keys,
    same counts, same exact-decimal sums — and no sentinel artifacts."""
    from pyiceberg_lakehouse_spark.streaming.queries2 import (
        stream_session_windows,
    )
    from pyiceberg_lakehouse_spark.streaming.windows import SENTINEL_USER

    got = stream_session_windows(spark, sf_dir)
    batch = sessionize(load_table(spark, sf_dir, "events"), gap="30 minutes")
    g = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in got.collect()
    }
    b = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert g == b
    assert all(u != SENTINEL_USER for (u, *_rest) in g)
