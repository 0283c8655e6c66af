"""SQL catalog backend: table -> metadata-location mapping in a shared DB.

The filesystem directory layout (``Lakehouse`` without a catalog) is a
single-host convention; a multi-host deployment needs a shared arbiter for
table NAMES — who created a table first, where its metadata lives now. This
mirrors the reference's SQL catalogs (main-daft-psql.py:214-223: a
pyiceberg ``sql`` catalog over SQLite or PostgreSQL): the catalog stores
ONLY the name -> metadata-location pointer; snapshots, schema, and commit
locking stay in the per-table snapshot log, exactly like the reference's
metadata stays in the warehouse.

Backends: stdlib ``sqlite3`` (reference default, main-daft-psql.py:48-49:
``sqlite:///catalog.db``) ships ready to use; ``postgresql://`` URIs bind
to psycopg2 or pg8000 when either is importable (neither ships in this
container — the URI raises with a pointer instead of half-working). The SQL
is deliberately portable (one table, PK-decided inserts, per-backend
insert-ignore: OR IGNORE on sqlite3, a targeted ON CONFLICT elsewhere), so
ANY DB-API connection drops in via ``connection_factory`` — that is also
how the test suite proves the Postgres code path without a server.

Concurrency: every mutation runs in an explicit transaction (``BEGIN
IMMEDIATE`` on SQLite, plain ``BEGIN`` elsewhere) and the primary-key
constraint — not a check-then-insert window — decides create/rename races;
the loser sees the winner's row and gets the same error a single process
would.
"""

from __future__ import annotations

import contextlib
import os
import sqlite3
import warnings
from collections.abc import Callable

_DDL = (
    "create table if not exists lakehouse_tables ("
    " namespace text not null,"
    " name text not null,"
    " metadata_location text not null,"
    " primary key (namespace, name))",
    "create table if not exists lakehouse_namespaces ("
    " namespace text primary key)",
    # CREATE VIEW surface: views store SQL TEXT, resolved against the
    # warehouse's tables at read time — pure metadata, same PK-decides-
    # the-race contract as table registration
    "create table if not exists lakehouse_views ("
    " namespace text not null,"
    " name text not null,"
    " sql_text text not null,"
    " primary key (namespace, name))",
)


class SqlCatalog:
    """Name -> metadata-location catalog over a DB-API connection.

    ``connection_factory``: zero-arg callable returning a fresh DB-API
    connection in autocommit mode (explicit BEGIN/COMMIT statements manage
    transactions). ``paramstyle``: "qmark" (?) or "format" (%s), per the
    driver. ``integrity_error``: the driver's IntegrityError class(es),
    used to translate PK-race losses into FileExistsError.
    """

    def __init__(
        self,
        uri: str,
        connection_factory: Callable[[], object] | None = None,
        paramstyle: str = "qmark",
        integrity_error: type | tuple = (),
    ):
        self.uri = uri
        self._begin = "begin"
        # Explicit conflict target: portable to PostgreSQL and SQLite >= 3.24
        # (a bare ON CONFLICT needs SQLite >= 3.35); the sqlite3 branch below
        # swaps in INSERT OR IGNORE, which works on any SQLite.
        self._ns_insert = (
            "insert into lakehouse_namespaces values (?)"
            " on conflict (namespace) do nothing"
        )
        self._integrity: tuple = (
            integrity_error if isinstance(integrity_error, tuple) else (integrity_error,)
        )
        if connection_factory is not None:
            if not self._integrity:
                warnings.warn(
                    "SqlCatalog(connection_factory=...) without integrity_error: "
                    "create/rename races will surface as raw driver exceptions "
                    "instead of FileExistsError; pass the driver's "
                    "IntegrityError class(es) to keep the documented contract",
                    stacklevel=2,
                )
            self._connect = connection_factory
            self._param = "?" if paramstyle == "qmark" else "%s"
        elif uri.startswith("postgresql"):
            self._connect = self._postgres_factory(uri)
            self._param = "%s"
        else:
            if uri.startswith("sqlite:///"):
                path = uri[len("sqlite:///") :]
            elif uri.startswith("sqlite://"):
                raise ValueError(f"malformed sqlite uri {uri!r}; use sqlite:///path")
            else:
                path = uri
            if path != ":memory:":
                os.makedirs(
                    os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True
                )
            self.path = path
            self._connect = self._sqlite_factory(path)
            self._param = "?"
            self._begin = "begin immediate"
            self._ns_insert = "insert or ignore into lakehouse_namespaces values (?)"
            self._integrity = self._integrity + (sqlite3.IntegrityError,)
        with self._tx() as cur:
            for ddl in _DDL:
                cur.execute(ddl)

    # ------------------------------------------------------------- drivers --

    @staticmethod
    def _sqlite_factory(path: str) -> Callable[[], sqlite3.Connection]:
        def factory() -> sqlite3.Connection:
            con = sqlite3.connect(path, timeout=30.0)
            con.isolation_level = None  # explicit transactions only
            return con

        return factory

    def _postgres_factory(self, uri: str) -> Callable[[], object]:
        """Bind a PostgreSQL DB-API driver (psycopg2, then pg8000).

        Reference parity: main-daft-psql.py:214-223 configures the same
        catalog over ``postgresql+psycopg2://``. Autocommit is enabled so
        the explicit BEGIN/COMMIT statements own transaction boundaries,
        matching the SQLite path.
        """
        dsn = uri.replace("postgresql+psycopg2", "postgresql", 1)
        try:
            import psycopg2  # type: ignore[import-not-found]

            self._integrity = self._integrity + (psycopg2.IntegrityError,)

            def factory():
                con = psycopg2.connect(dsn)
                con.autocommit = True
                return con

            return factory
        except ImportError:
            pass
        try:
            import pg8000.dbapi as pg  # type: ignore[import-not-found]
            from urllib.parse import urlparse

            u = urlparse(dsn)
            self._integrity = self._integrity + (pg.IntegrityError,)

            def factory():
                con = pg.connect(
                    user=u.username or "postgres",
                    password=u.password,
                    host=u.hostname or "localhost",
                    port=u.port or 5432,
                    database=(u.path or "/postgres").lstrip("/") or "postgres",
                )
                con.autocommit = True
                return con

            return factory
        except ImportError:
            raise NotImplementedError(
                "PostgreSQL catalog needs a psycopg2 or pg8000 driver; "
                "neither is installed in this environment — use "
                "sqlite:///path/to/catalog.db, or pass connection_factory="
            ) from None

    # --------------------------------------------------------------- plumbing --

    def _q(self, sql: str) -> str:
        return sql if self._param == "?" else sql.replace("?", self._param)

    @contextlib.contextmanager
    def _tx(self, immediate: bool = False):
        """One transaction on a fresh connection; commits on success,
        rolls back on any exception. Yields a cursor (portable across
        DB-API drivers, unlike sqlite3's connection.execute shortcut)."""
        con = self._connect()
        try:
            cur = con.cursor()
            cur.execute(self._begin if immediate else "begin")
            try:
                yield cur
                cur.execute("commit")
            except BaseException:
                with contextlib.suppress(Exception):
                    cur.execute("rollback")
                raise
        finally:
            con.close()

    # ---------------------------------------------------------- namespaces --

    def create_namespace(self, namespace: str) -> None:
        with self._tx() as cur:
            cur.execute(self._q(self._ns_insert), (namespace,))

    def list_namespaces(self) -> list[str]:
        with self._tx() as cur:
            cur.execute(
                "select namespace from lakehouse_namespaces"
                " union select distinct namespace from lakehouse_tables"
                " order by 1"
            )
            return [r[0] for r in cur.fetchall()]

    # -------------------------------------------------------------- tables --

    def register_table(self, namespace: str, name: str, metadata_location: str) -> None:
        """Atomically claim ``namespace.name`` — the multi-writer arbiter.

        Raises FileExistsError if any process (including this one) already
        registered it; the PK constraint decides the race, not a check-then-
        insert window.
        """
        try:
            with self._tx(immediate=True) as cur:
                cur.execute(
                    self._q("insert into lakehouse_tables values (?,?,?)"),
                    (namespace, name, metadata_location),
                )
                cur.execute(self._q(self._ns_insert), (namespace,))
        except self._integrity:
            raise FileExistsError(
                f"table {namespace}.{name} already registered"
            ) from None

    def load_location(self, namespace: str, name: str) -> str:
        with self._tx() as cur:
            cur.execute(
                self._q(
                    "select metadata_location from lakehouse_tables"
                    " where namespace=? and name=?"
                ),
                (namespace, name),
            )
            row = cur.fetchone()
        if row is None:
            raise FileNotFoundError(f"no such table {namespace}.{name} in catalog")
        return row[0]

    def table_exists(self, namespace: str, name: str) -> bool:
        try:
            self.load_location(namespace, name)
            return True
        except FileNotFoundError:
            return False

    def list_tables(self, namespace: str) -> list[str]:
        with self._tx() as cur:
            cur.execute(
                self._q(
                    "select name from lakehouse_tables where namespace=? order by 1"
                ),
                (namespace,),
            )
            return [r[0] for r in cur.fetchall()]

    def register_view(
        self, namespace: str, name: str, sql_text: str, replace: bool = False
    ) -> None:
        """Atomically claim a view name; ``replace=True`` is CREATE OR
        REPLACE (delete + insert in ONE transaction, so a concurrent
        reader never observes the name missing)."""
        try:
            with self._tx(immediate=True) as cur:
                if replace:
                    cur.execute(
                        self._q(
                            "delete from lakehouse_views"
                            " where namespace=? and name=?"
                        ),
                        (namespace, name),
                    )
                cur.execute(
                    self._q("insert into lakehouse_views values (?,?,?)"),
                    (namespace, name, sql_text),
                )
                cur.execute(self._q(self._ns_insert), (namespace,))
        except self._integrity:
            raise FileExistsError(
                f"view {namespace}.{name} already registered"
            ) from None

    def load_view(self, namespace: str, name: str) -> str:
        with self._tx() as cur:
            cur.execute(
                self._q(
                    "select sql_text from lakehouse_views"
                    " where namespace=? and name=?"
                ),
                (namespace, name),
            )
            row = cur.fetchone()
        if row is None:
            raise FileNotFoundError(f"no such view {namespace}.{name} in catalog")
        return row[0]

    def list_views(self, namespace: str) -> list[str]:
        with self._tx() as cur:
            cur.execute(
                self._q(
                    "select name from lakehouse_views where namespace=? order by 1"
                ),
                (namespace,),
            )
            return [r[0] for r in cur.fetchall()]

    def drop_view(self, namespace: str, name: str) -> None:
        with self._tx(immediate=True) as cur:
            cur.execute(
                self._q("delete from lakehouse_views where namespace=? and name=?"),
                (namespace, name),
            )

    def drop_table(self, namespace: str, name: str) -> None:
        with self._tx(immediate=True) as cur:
            cur.execute(
                self._q("delete from lakehouse_tables where namespace=? and name=?"),
                (namespace, name),
            )

    def rename_table(self, src_ns: str, src: str, dst_ns: str, dst: str) -> None:
        """Metadata-only pointer rename: the table directory never moves, so
        rename is O(1) regardless of table size (vs. the filesystem
        catalog's dir move + log path rewrite).

        The SELECT pre-check gives the friendly error in the common case; a
        concurrent rename racing past it loses on the PK constraint instead
        (READ COMMITTED lets both renames pass the SELECT), which is
        translated to the same FileExistsError a single process would see.
        """
        try:
            with self._tx(immediate=True) as cur:
                cur.execute(
                    self._q(
                        "select 1 from lakehouse_tables where namespace=? and name=?"
                    ),
                    (dst_ns, dst),
                )
                if cur.fetchone():
                    raise FileExistsError(f"table {dst_ns}.{dst} already exists")
                cur.execute(
                    self._q(
                        "update lakehouse_tables set namespace=?, name=?"
                        " where namespace=? and name=?"
                    ),
                    (dst_ns, dst, src_ns, src),
                )
                if cur.rowcount == 0:
                    raise FileNotFoundError(f"no such table {src_ns}.{src}")
                cur.execute(self._q(self._ns_insert), (dst_ns,))
        except self._integrity:
            raise FileExistsError(f"table {dst_ns}.{dst} already exists") from None
