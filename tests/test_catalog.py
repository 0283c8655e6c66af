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


# --- Postgres code path against a mocked DB-API driver -----------------------
# No Postgres server ships in this environment, so the "format"-paramstyle /
# driver-IntegrityError / plain-BEGIN path is proven with a DB-API shim over
# sqlite: the catalog SQL is identical for both backends by construction.

import sqlite3  # noqa: E402


class _FakeIntegrityError(Exception):
    """Stands in for psycopg2.IntegrityError / pg8000.IntegrityError."""


class _FakePgCursor:
    def __init__(self, cur):
        self._cur = cur

    def execute(self, sql, params=()):
        assert "?" not in sql, f"unconverted qmark placeholder in {sql!r}"
        try:
            self._cur.execute(sql.replace("%s", "?"), params)
        except sqlite3.IntegrityError as e:
            raise _FakeIntegrityError(str(e)) from None

    def fetchone(self):
        return self._cur.fetchone()

    def fetchall(self):
        return self._cur.fetchall()

    @property
    def rowcount(self):
        return self._cur.rowcount


class _FakePgConnection:
    def __init__(self, path):
        self._con = sqlite3.connect(path, timeout=30.0)
        self._con.isolation_level = None
        self.autocommit = True

    def cursor(self):
        return _FakePgCursor(self._con.cursor())

    def close(self):
        self._con.close()


def _pg_catalog(path: str) -> SqlCatalog:
    return SqlCatalog(
        "postgresql://mock-host/catalog_db",
        connection_factory=lambda: _FakePgConnection(path),
        paramstyle="format",
        integrity_error=_FakeIntegrityError,
    )


def test_mocked_postgres_dbapi_lifecycle(tmp_path):
    """create/register/load/rename/drop through the Postgres code path:
    %s placeholders everywhere, driver IntegrityError translated to
    FileExistsError, rename races decided by the PK."""
    cat = _pg_catalog(str(tmp_path / "pg.db"))
    cat.create_namespace("ns")
    cat.create_namespace("ns")  # idempotent (ON CONFLICT DO NOTHING)
    cat.register_table("ns", "t1", "/loc/1")
    assert cat.load_location("ns", "t1") == "/loc/1"
    with pytest.raises(FileExistsError):
        cat.register_table("ns", "t1", "/loc/2")
    assert cat.load_location("ns", "t1") == "/loc/1"  # loser didn't clobber
    cat.register_table("ns", "t2", "/loc/2")
    assert cat.list_tables("ns") == ["t1", "t2"]
    cat.rename_table("ns", "t1", "ns2", "t1")
    with pytest.raises(FileExistsError):
        cat.rename_table("ns", "t2", "ns2", "t1")
    with pytest.raises(FileNotFoundError):
        cat.rename_table("ns", "missing", "ns", "x")
    assert cat.list_namespaces() == ["ns", "ns2"]
    assert cat.table_exists("ns2", "t1")
    cat.drop_table("ns", "t2")
    assert cat.list_tables("ns") == []


def test_mocked_postgres_create_race_single_winner(tmp_path):
    """8 workers race to claim one table through the mocked-DB-API Postgres
    path; the PK picks exactly one winner and losers get FileExistsError."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "pg_race.db")
    _pg_catalog(path)  # init schema before racing

    def claim(i: int):
        try:
            _pg_catalog(path).register_table("ns", "contested", f"/loc/{i}")
            return i
        except FileExistsError:
            return None

    with ThreadPoolExecutor(8) as ex:
        winners = [r for r in ex.map(claim, range(8)) if r is not None]
    assert len(winners) == 1
    assert _pg_catalog(path).load_location("ns", "contested") == f"/loc/{winners[0]}"


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


# ---- round-5 advisor regressions (ADVICE.md r4) ---------------------------


class _RaceBlindCursor(_FakePgCursor):
    """Simulates READ COMMITTED: the rename pre-check SELECT never sees the
    concurrently-committed destination row, so the UPDATE must lose on the
    PK constraint instead."""

    def execute(self, sql, params=()):
        self._blind = sql.lstrip().lower().startswith("select 1 from lakehouse_tables")
        super().execute(sql, params)

    def fetchone(self):
        if getattr(self, "_blind", False):
            return None
        return super().fetchone()


class _RaceBlindConnection(_FakePgConnection):
    def cursor(self):
        return _RaceBlindCursor(self._con.cursor())


def test_rename_race_past_precheck_translated_to_fileexists(tmp_path):
    """Two renames to the same destination under READ COMMITTED: the loser
    passes the SELECT pre-check, hits the PK on UPDATE, and must get the
    same FileExistsError a single process would — not a raw driver error."""
    path = str(tmp_path / "pg_rename_race.db")
    cat = _pg_catalog(path)
    cat.register_table("ns", "a", "/loc/a")
    cat.register_table("ns", "b", "/loc/b")
    cat.rename_table("ns", "a", "ns", "dst")  # winner commits first
    blind = SqlCatalog(
        "postgresql://mock-host/catalog_db",
        connection_factory=lambda: _RaceBlindConnection(path),
        paramstyle="format",
        integrity_error=_FakeIntegrityError,
    )
    with pytest.raises(FileExistsError):
        blind.rename_table("ns", "b", "ns", "dst")
    # loser's transaction rolled back: b is still there, dst still points at a
    assert cat.load_location("ns", "b") == "/loc/b"
    assert cat.load_location("ns", "dst") == "/loc/a"


def test_connection_factory_without_integrity_error_warns(tmp_path):
    path = str(tmp_path / "pg_warn.db")
    with pytest.warns(UserWarning, match="integrity_error"):
        SqlCatalog(
            "postgresql://mock-host/catalog_db",
            connection_factory=lambda: _FakePgConnection(path),
            paramstyle="format",
        )


def test_sqlite_backend_uses_or_ignore(tmp_path):
    """INSERT OR IGNORE works on any SQLite; bare ON CONFLICT needs 3.35+.
    The sqlite branch must pick the portable spelling, and namespace
    creation must stay idempotent."""
    cat = SqlCatalog(f"sqlite:///{tmp_path}/old_sqlite.db")
    assert cat._ns_insert.lower().startswith("insert or ignore")
    cat.create_namespace("ns")
    cat.create_namespace("ns")
    assert cat.list_namespaces() == ["ns"]
