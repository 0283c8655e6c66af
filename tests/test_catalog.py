"""SQL-catalog backend (lakehouse/catalog.py): shared name->location
mapping with cross-process atomic create/rename, mirroring the reference's
SQLite/PostgreSQL catalogs (main-daft-psql.py:214-223)."""

from __future__ import annotations

import multiprocessing as mp
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.catalog import SqlCatalog

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


@pytest.fixture()
def cat_uri(tmp_path) -> str:
    return f"sqlite:///{tmp_path}/catalog.db"


def test_catalog_roundtrip(spark, warehouse, cat_uri):
    lh = Lakehouse(spark, warehouse, catalog_uri=cat_uri)
    t = lh.create_table("ns.users", SCHEMA)
    t.append(spark.range(10).select("id", F.lit("x").alias("v")))
    # a SECOND handle (fresh process would look the same): resolves through
    # the catalog, reads the same data
    lh2 = Lakehouse(spark, warehouse, catalog_uri=cat_uri)
    assert lh2.list_namespaces() == ["ns"]
    assert lh2.list_tables("ns") == ["users"]
    assert lh2.load_table("ns.users").scan().count() == 10
    with pytest.raises(FileExistsError):
        lh2.create_table("ns.users", SCHEMA)
    assert lh2.create_table("ns.users", SCHEMA, if_not_exists=True).scan().count() == 10


def test_catalog_rename_is_pointer_only(spark, warehouse, cat_uri):
    lh = Lakehouse(spark, warehouse, catalog_uri=cat_uri)
    t = lh.create_table("ns.old", SCHEMA)
    t.append(spark.range(5).select("id", F.lit("x").alias("v")))
    old_dir = t.table_dir
    lh.rename_table("ns.old", "ns2.new")
    # directory did NOT move; the pointer did
    assert os.path.isdir(old_dir)
    t2 = lh.load_table("ns2.new")
    assert t2.table_dir == old_dir
    assert t2.scan().count() == 5
    with pytest.raises(FileNotFoundError):
        lh.load_table("ns.old")


def test_catalog_drop_table(spark, warehouse, cat_uri):
    lh = Lakehouse(spark, warehouse, catalog_uri=cat_uri)
    t = lh.create_table("ns.gone", SCHEMA)
    d = t.table_dir
    lh.drop_table("ns.gone")
    assert not os.path.exists(d)
    assert lh.list_tables("ns") == []
    lh.drop_table("ns.gone")  # idempotent


def test_postgres_uri_gated():
    with pytest.raises(NotImplementedError, match="psycopg2"):
        SqlCatalog("postgresql+psycopg2://root:x@localhost/catalog_db")


def _race_create(args):
    uri, winner_marker = args
    cat = SqlCatalog(uri)
    try:
        cat.register_table("ns", "contested", winner_marker)
        return winner_marker
    except FileExistsError:
        return None


def test_multiprocess_create_race_single_winner(tmp_path):
    """N processes race to claim the same table name through the shared
    catalog; exactly one wins, and the catalog records that winner."""
    uri = f"sqlite:///{tmp_path}/race.db"
    SqlCatalog(uri)  # init schema before forking
    with mp.Pool(8) as pool:
        results = pool.map(_race_create, [(uri, f"/loc/{i}") for i in range(8)])
    winners = [r for r in results if r is not None]
    assert len(winners) == 1
    assert SqlCatalog(uri).load_location("ns", "contested") == winners[0]
