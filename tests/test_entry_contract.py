"""Driver-contract consistency: entry smoke + registry invariants."""

import importlib.util
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_oracle_has_a_query():
    mod = _load_entry()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 55


def test_query_names_are_stable_identifiers():
    mod = _load_entry()
    for name in mod.queries():
        assert name.replace("_", "").isalnum(), name


def test_driver_window_has_no_complex_typed_columns(spark, sf_dir):
    """The driver's canonicalizer sorts result rows with pandas Categorical,
    which cannot hash ndarray/dict cells — an array/map/struct column in any
    driver-window query errors the row before comparison (r3's only red row,
    fn_array_higher_order). Every driver-visible query must return scalar
    columns only; flatten with array_join / to_json at the query edge."""
    from pyspark.sql import types as T

    from pyiceberg_lakehouse_spark.registry import DRIVER_WINDOW, QUERIES, load_all

    load_all()
    offenders = {}
    for name in DRIVER_WINDOW:
        df = QUERIES[name](spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"driver-window queries with unhashable columns: {offenders}"


def test_driver_window_spans_every_category():
    """The driver's correctness sweep reads the first 50 registry entries;
    they must sample every engine category (VERDICT r2 task #1)."""
    mod = _load_entry()
    head = list(mod.queries())[:50]
    assert "agg_q1_pricing_summary" in head
    for prefix in ("lh_", "dedup_", "sim_", "stream_", "train_", "text_",
                   "multimodal_", "join_", "win_", "fn_", "scan_"):
        assert any(n.startswith(prefix) for n in head), f"no {prefix}* in driver window"
    # TPC-H plan topologies stay strongly represented (specific ids rotate)
    assert sum(n.startswith("agg_q") for n in head) >= 5
