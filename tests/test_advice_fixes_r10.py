"""Regression tests for the four r9-advisor (ADVICE.md round 10) findings.

1. (high) merge_into: a NULL clause condition is NOT-satisfied (SQL MERGE
   semantics) — rows whose condition evaluates to NULL fall through to the
   next clause instead of being silently dropped from the table.
2. events_funnel_skewsafe: no unconditional broadcast hint on the stage
   frames — the logical plan carries no ResolvedHint, so at scale the join
   degrades to a shuffle instead of failing on the broadcast size limit.
3. jpeg_progressive: T.81 fill bytes (repeated 0xFF) before a marker are
   skipped, in both the decoder's segment loop and the header probe.
4. rollup stddev derivation clamps fractionally-negative FP variance to
   0.0 instead of surfacing NaN from sqrt.
"""

import math
import uuid

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ #1 --


def test_merge_into_null_condition_falls_through(spark, tmp_path):
    """A matched row whose delete condition is NULL must NOT be deleted;
    with update enabled it updates, mirroring MERGE clause fall-through."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.upsert import merge_into

    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    df = spark.createDataFrame(
        [(1, "F", 1.0), (2, None, 2.0), (3, "ok", 3.0)],
        "id long, tag string, v double",
    )
    t = lh.create_table("ns.minull", df.schema)
    t.append(df)
    src = spark.createDataFrame(
        [(1, "F", 11.0), (2, None, 22.0), (3, "ok", 33.0)],
        "id long, tag string, v double",
    )
    merge_into(t, src, ["id"], matched_delete=F.col("tag") == "F")
    got = {r.id: (r.tag, r.v) for r in t.scan().collect()}
    # id=1: condition TRUE -> deleted. id=2: condition NULL (tag IS NULL)
    # -> not satisfied -> falls through to UPDATE. id=3: FALSE -> UPDATE.
    assert got == {2: (None, 22.0), 3: ("ok", 33.0)}


def test_merge_into_null_condition_keeps_row_when_update_disabled(
    spark, tmp_path
):
    """With update disabled too, the NULL-condition row stays untouched —
    it must never vanish."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.upsert import merge_into

    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    df = spark.createDataFrame([(2, None, 2.0)], "id long, tag string, v double")
    t = lh.create_table("ns.minull2", df.schema)
    t.append(df)
    src = spark.createDataFrame(
        [(2, None, 99.0)], "id long, tag string, v double"
    )
    merge_into(
        t,
        src,
        ["id"],
        matched_delete=F.col("tag") == "F",
        matched_update=F.col("tag") == "G",
        not_matched_insert=False,
    )
    got = [(r.id, r.tag, r.v) for r in t.scan().collect()]
    assert got == [(2, None, 2.0)]


def test_merge_into_null_insert_condition_blocks_insert(spark, tmp_path):
    """A NULL insert condition blocks the insert (not-satisfied), it does
    not admit the row."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.upsert import merge_into

    lh = Lakehouse(spark, str(tmp_path / uuid.uuid4().hex))
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, tag string, v double")
    t = lh.create_table("ns.minull3", df.schema)
    t.append(df)
    src = spark.createDataFrame(
        [(5, None, 5.0)], "id long, tag string, v double"
    )
    merge_into(t, src, ["id"], not_matched_insert=F.col("_src_tag") == "x")
    assert [r.id for r in t.scan().collect()] == [1]


# ------------------------------------------------------------------ #2 --


def test_funnel_skewsafe_has_no_broadcast_hint(spark, sf_dir):
    """The skew-safe funnel's logical plan must carry NO explicit
    broadcast hint — broadcast-vs-shuffle is AQE's runtime decision, so a
    huge signed-user frame degrades instead of failing the job."""
    from pyiceberg_lakehouse_spark.registry import QUERIES, load_all

    load_all()
    df = QUERIES["events_funnel_skewsafe"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed[:1500]
    assert "UnresolvedHint" not in analyzed


# ------------------------------------------------------------------ #3 --


def _with_fill_bytes(payload: bytes) -> bytes:
    """Insert T.81 fill bytes (extra 0xFF) before every non-SOI marker
    segment boundary that follows a parsed segment."""
    import struct

    out = bytearray(payload[:2])  # SOI
    pos = 2
    while pos + 2 <= len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        out += b"\xff\xff"  # two fill bytes, then the real marker
        if marker == 0xD9:
            out += payload[pos:]
            return bytes(out)
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker == 0xDA:
            # copy SOS header + entropy data to the next marker-at-top-level
            # (our encoder emits a single scan per SOS ending at 0xFF<mk>)
            out += payload[pos:]
            return bytes(out)
        out += payload[pos : pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


def test_progressive_decode_skips_fill_bytes():
    from pyiceberg_lakehouse_spark.operators.jpeg_progressive import (
        decode_progressive,
        encode_progressive,
        progressive_header,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    clean = encode_progressive(px, quality=90)
    padded = _with_fill_bytes(clean)
    assert padded != clean and len(padded) > len(clean)
    assert np.array_equal(decode_progressive(padded), decode_progressive(clean))
    assert progressive_header(padded) == progressive_header(clean)


def test_baseline_decode_skips_fill_bytes():
    from pyiceberg_lakehouse_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_header,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(16, 21, 3), dtype=np.uint8)
    clean = encode_jpeg(px, quality=85)
    padded = _with_fill_bytes(clean)
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(clean))
    assert jpeg_header(padded) == jpeg_header(clean)


# ------------------------------------------------------------------ #4 --


def test_rollup_stddev_clamps_fp_negative_variance(spark):
    """A summary state whose psumsq - psum^2/n is fractionally negative
    (near-constant non-integer measure) derives stddev 0.0, never NaN."""
    from pyiceberg_lakehouse_spark.lakehouse.rollup import _derive_requested

    # n=3 copies of x = 0.1 + 2^-55 jitter: exact float arithmetic makes
    # ss - s*s/n a tiny negative number
    x = 0.1
    s = x * 3
    ss = x * x * 3
    # force the rounding direction: nudge ss down one ulp
    ss = math.nextafter(ss, -math.inf)
    assert ss - s * s / 3 < 0  # precondition: raw variance negative
    df = spark.createDataFrame(
        [("g", s, ss, 3)],
        "dim string, psum_v double, psumsq_v double, pcnt_v long",
    )
    out = _derive_requested(df, ["dim"], [("v", "stddev")]).collect()[0]
    assert out["stddev_v"] == 0.0 and not math.isnan(out["stddev_v"])
