"""CREATE VIEW surface: filesystem and SQL-catalog storage
(lakehouse/catalog.py::register_view etc., table.py::create_view/read_view)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.catalog import SqlCatalog
from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

SF = "/root/testdata/sf0.001"


def test_filesystem_view_lifecycle_tracks_latest_snapshot(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    orders = load_table(spark, SF, "orders")
    t = lh.create_table("ns.v_orders", SCHEMAS["orders"])
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    lh.create_view(
        "ns.order_counts",
        "select o_orderstatus, count(*) as n from ns_v_orders group by 1",
    )
    n1 = {r.o_orderstatus: r.n for r in lh.read_view("ns.order_counts").collect()}
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    n2 = {r.o_orderstatus: r.n for r in lh.read_view("ns.order_counts").collect()}
    assert sum(n2.values()) > sum(n1.values())  # the view is never frozen
    assert sum(n2.values()) == orders.count()

    with pytest.raises(FileExistsError):
        lh.create_view("ns.order_counts", "select 1 as x")
    lh.create_view("ns.order_counts", "select 1 as x", replace=True)
    assert lh.read_view("ns.order_counts").collect()[0].x == 1
    assert lh.list_views("ns") == ["order_counts"]
    lh.drop_view("ns.order_counts")
    assert lh.list_views("ns") == []
    with pytest.raises(FileNotFoundError):
        lh.read_view("ns.order_counts")


def test_sql_catalog_view_lifecycle(tmp_path):
    cat = SqlCatalog(f"sqlite:///{tmp_path}/cat.db")
    cat.register_view("ns", "v1", "select 1")
    assert cat.load_view("ns", "v1") == "select 1"
    with pytest.raises(FileExistsError):
        cat.register_view("ns", "v1", "select 2")
    cat.register_view("ns", "v1", "select 2", replace=True)
    assert cat.load_view("ns", "v1") == "select 2"
    assert cat.list_views("ns") == ["v1"]
    cat.drop_view("ns", "v1")
    assert cat.list_views("ns") == []
    with pytest.raises(FileNotFoundError):
        cat.load_view("ns", "v1")


def test_sql_catalog_view_race_decided_by_pk(tmp_path):
    # two handles to the same catalog db: the second insert loses on the PK
    uri = f"sqlite:///{tmp_path}/race.db"
    a, b = SqlCatalog(uri), SqlCatalog(uri)
    a.register_view("ns", "v", "select 1")
    with pytest.raises(FileExistsError):
        b.register_view("ns", "v", "select 9")
    assert b.load_view("ns", "v") == "select 1"


def test_views_do_not_shadow_tables_in_listing(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.real_table", SCHEMAS["orders"])
    t.append(load_table(spark, SF, "orders").limit(5))
    lh.create_view("ns.a_view", "select 1 as x")
    assert lh.list_tables("ns") == ["real_table"]
    assert lh.list_views("ns") == ["a_view"]
