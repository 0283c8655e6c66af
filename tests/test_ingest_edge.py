"""Ingest error isolation, dictionary decode, merge property test."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyiceberg_lakehouse_spark.lakehouse.upsert import merge_keep_last
from pyiceberg_lakehouse_spark.sources.ingest import ingest_files


def test_ingest_files_isolates_bad_file(spark, tmp_path):
    """Per-file error isolation: one lossy file is skipped, the rest land
    (main-daft.py:134-136 semantics)."""
    good = tmp_path / "good.parquet"
    bad = tmp_path / "bad.parquet"
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), good)
    pq.write_table(pa.table({"x": pa.array(["1", "oops"], pa.string())}), bad)

    schema = T.StructType([T.StructField("x", T.IntegerType())])
    landed = []
    report = ingest_files(
        spark, [str(good), str(bad)], schema, sink=lambda df: landed.append(df.count())
    )
    assert report.ok_files == [str(good)]
    assert str(bad) in report.failed
    assert landed == [3]
    assert report.rows == 3


def test_dictionary_encoded_parquet_reads_transparently(spark, tmp_path):
    """C3: dictionary-encoded string columns decode transparently in Spark
    (the reference must decode explicitly, main-daft.py:126-132)."""
    path = tmp_path / "dict.parquet"
    col = pa.array(["A", "B", "A", "C", "A"]).dictionary_encode()
    pq.write_table(pa.table({"group": col}), path, use_dictionary=True)
    df = spark.read.parquet(str(path))
    assert df.schema["group"].dataType == T.StringType()
    assert {r.group for r in df.collect()} == {"A", "B", "C"}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    old_keys=st.sets(st.integers(0, 30), max_size=15),
    new_keys=st.sets(st.integers(0, 30), max_size=15),
)
@pytest.mark.slow
def test_merge_property_union_of_keys(spark, old_keys, new_keys):
    """SURVEY §5.4: for ANY key overlap, |merge| = |keys(old) ∪ keys(new)|
    and every overlapping key takes the new side's value."""
    old = spark.createDataFrame([(k, "old") for k in old_keys], "k int, v string")
    new = spark.createDataFrame([(k, "new") for k in new_keys], "k int, v string")
    merged = {r.k: r.v for r in merge_keep_last(old, new, ["k"]).collect()}
    assert set(merged) == old_keys | new_keys
    for k in new_keys:
        assert merged[k] == "new"
    for k in old_keys - new_keys:
        assert merged[k] == "old"


def test_drop_column_evolution(spark, warehouse, sf_dir):
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    nation = load_table(spark, sf_dir, "nation")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.nation_dc", SCHEMAS["nation"])
    t.append(nation)
    t.drop_column("n_name")
    df = t.scan()
    assert df.columns == ["n_nationkey", "n_regionkey"]
    assert df.count() == nation.count()
    with pytest.raises(KeyError):
        t.drop_column("n_name")


def test_multifile_scan_parallelism(spark, warehouse, sf_dir):
    """D5/S8: a multi-commit table scans with >1 input partition (task
    parallelism replaces the reference's process pool)."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    orders = load_table(spark, sf_dir, "orders")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.orders_mp", SCHEMAS["orders"])
    for m in range(4):
        t.append(orders.filter(F.col("o_orderkey") % 4 == m))
    assert t.scan().rdd.getNumPartitions() > 1
    assert t.scan().count() == orders.count()
