"""Loader / inference / strict-cast coverage (SURVEY.md §5 fixtures)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyiceberg_lakehouse_spark.sources import (
    SCHEMAS,
    TABLES,
    infer_spark_schema,
    load_table,
    strict_cast,
)

EXPECTED_ROWS = {
    "region": 5,
    "nation": 25,
    "customer": 150,
    "supplier": 10,
    "part": 200,
    "orders": 1500,
    "lineitem": 6000,
    "events": 1000,
    "documents": 500,
    "embeddings": 500,
}


@pytest.mark.parametrize("name", TABLES)
def test_load_every_table(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    assert df.count() == EXPECTED_ROWS[name]


def test_events_ts_is_exact_micros(spark, sf_dir):
    """The long->micros conversion must be exact integer division, using
    the unit actually declared in the parquet footer (testdata generations
    have shipped both TIMESTAMP_NS and TIMESTAMP_US)."""
    from pyiceberg_lakehouse_spark.sources.testdata import events_ts_unit

    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampNTZType)
    unit = events_ts_unit(f"{sf_dir}/events.parquet")
    assert unit in ("ns", "us")
    divisor = 1000 if unit == "ns" else 1
    # row-level check against python integer division of the raw longs
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.read.schema(SCHEMAS["events"])
        .parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "ts")
        .collect()
    )
    got = {r.event_id: r.ts for r in ev.select("event_id", "ts").collect()}
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    for r in raw[:200]:
        micros = r.ts // divisor
        assert got[r.event_id] == epoch + datetime.timedelta(microseconds=micros)


def test_infer_schema_matches_declared(sf_dir):
    inferred = infer_spark_schema(f"{sf_dir}/lineitem.parquet")
    assert [f.name for f in inferred.fields] == [f.name for f in SCHEMAS["lineitem"].fields]
    assert isinstance(inferred["l_quantity"].dataType, T.DoubleType)
    assert isinstance(inferred["l_shipdate"].dataType, T.TimestampNTZType)


def test_infer_schema_embeddings_list(sf_dir):
    inferred = infer_spark_schema(f"{sf_dir}/embeddings.parquet")
    assert inferred["embedding"].dataType == T.ArrayType(T.FloatType())


def test_strict_cast_roundtrip(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer")
    out = strict_cast(df, SCHEMAS["customer"])
    assert out.count() == 150


def test_strict_cast_rejects_lossy(spark):
    df = spark.createDataFrame([("abc",), ("123",)], ["x"])
    target = T.StructType([T.StructField("x", T.IntegerType())])
    with pytest.raises(ValueError, match="lose values"):
        strict_cast(df, target)


def test_strict_cast_rejects_schema_drift(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    target = T.StructType([T.StructField("a", T.IntegerType())])
    with pytest.raises(ValueError, match="schema mismatch"):
        strict_cast(df, target)


def test_synthetic_mock_dataset_shape(spark):
    from pyiceberg_lakehouse_spark.sources.synthetic import mock_dataset

    df = mock_dataset(spark, 1000)
    assert df.columns == ["id", "group", "value1", "value2"]
    groups = {r.group for r in df.select("group").distinct().collect()}
    assert groups == {"A", "B", "C", "D"}
    v2 = df.agg(F.min("value2"), F.max("value2")).collect()[0]
    assert v2[0] >= 1 and v2[1] <= 1000


def test_read_csv_checked_quarantines_bad_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from pyiceberg_lakehouse_spark.sources.ingest import read_csv_checked

    p = tmp_path / "drop"
    p.mkdir()
    (p / "a.csv").write_text(
        "id,name,score\n1,alpha,2.5\n2,beta,3.5\nbad,gamma,xyz\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    good, bad = read_csv_checked(spark, str(p), schema)
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert [r.raw_line for r in bad.collect()] == ["bad,gamma,xyz"]


def test_read_json_checked_quarantines_bad_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from pyiceberg_lakehouse_spark.sources.ingest import read_json_checked

    p = tmp_path / "jdrop"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"id": 1, "name": "alpha"}\n{not json at all}\n{"id": 2, "name": "beta"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    good, bad = read_json_checked(spark, str(p), schema)
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "not json" in bad.collect()[0].raw_line


class TestFwfChecked:
    def test_quarantine_and_nulls(self, spark, tmp_path):
        from pyiceberg_lakehouse_spark.sources.ingest import (
            read_fwf_checked,
        )

        p = tmp_path / "fwf"
        p.mkdir()
        (p / "data.txt").write_text(
            "       123A" + "42.50".rjust(14) + "\n"   # clean
            "       456B" + " " * 14 + "\n"   # blank amount -> NULL
            "       789C\n"                   # short record -> quarantine
            "      abcdD" + "10.00".rjust(14) + "\n"   # bad key
        )
        good, bad = read_fwf_checked(
            spark, str(p),
            [("k", 0, 10, "bigint"), ("tag", 10, 1, "string"),
             ("amt", 11, 14, "double")],
        )
        rows = {r["k"]: r for r in good.collect()}
        assert set(rows) == {123, 456}
        assert rows[123]["amt"] == 42.5
        assert rows[456]["amt"] is None
        assert bad.count() == 2

    def test_percent_decode_edges(self, spark):
        from pyspark.sql import functions as F

        from pyiceberg_lakehouse_spark.functions.urls import (
            percent_decode,
        )

        df = spark.createDataFrame(
            [("a%20b",), ("no-escapes",), ("%41%42c",), ("",)],
            "s string",
        )
        got = [r[0] for r in
               df.select(percent_decode(F.col("s"))).collect()]
        assert got == ["a b", "no-escapes", "ABc", ""]

    def test_percent_decode_malformed_passthrough(self, spark):
        """r16 ADVICE: a '%' not followed by two hex digits must pass
        through VERBATIM (visible), never silently drop the segment."""
        from pyspark.sql import functions as F

        from pyiceberg_lakehouse_spark.functions.urls import (
            percent_decode,
        )

        cases = [
            ("a%2", "a%2"),          # one hex digit
            ("a%zq-tail", "a%zq-tail"),  # no hex digits
            ("x%", "x%"),            # bare trailing %
            ("x%%41", "x%A"),        # empty segment then a valid escape
            ("%2Gh", "%2Gh"),        # second digit not hex
            ("ok%41%zz%20end", "okA%zz end"),  # mixed
        ]
        df = spark.createDataFrame([(c[0],) for c in cases], "s string")
        got = [r[0] for r in
               df.select(percent_decode(F.col("s"))).collect()]
        assert got == [c[1] for c in cases]
