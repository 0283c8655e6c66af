"""SQL catalog backend: table -> metadata-location mapping in a shared DB.

The filesystem directory layout (``Lakehouse`` without a catalog) is a
single-host convention; a multi-host deployment needs a shared arbiter for
table NAMES — who created a table first, where its metadata lives now. This
mirrors the reference's SQL catalogs (main-daft-psql.py:214-223: a
pyiceberg ``sql`` catalog over SQLite or PostgreSQL): the catalog stores
ONLY the name -> metadata-location pointer; snapshots, schema, and commit
locking stay in the per-table snapshot log, exactly like the reference's
metadata stays in the warehouse.

stdlib ``sqlite3`` is the shipped backend (reference default,
main-daft-psql.py:48-49: ``sqlite:///catalog.db``). The SQL is deliberately
ANSI (one table, PK upserts/updates) so a PostgreSQL DB-API connection
drops in; psycopg2 isn't in this container, so ``postgresql://`` URIs raise
with a pointer rather than half-working.

Concurrency: every mutation runs in ``BEGIN IMMEDIATE`` so two processes
racing to create or rename the same table serialize in the DB; the loser
sees the winner's row and gets the same error a single process would.
"""

from __future__ import annotations

import os
import contextlib
import sqlite3


class SqlCatalog:
    """Name -> metadata-location catalog over a DB-API connection."""

    def __init__(self, uri: str):
        if uri.startswith("postgresql"):
            raise NotImplementedError(
                "PostgreSQL catalog needs a psycopg2 driver, which this "
                "environment doesn't ship; use sqlite:///path/to/catalog.db"
            )
        if uri.startswith("sqlite:///"):
            path = uri[len("sqlite:///") :]
        elif uri.startswith("sqlite://"):
            raise ValueError(f"malformed sqlite uri {uri!r}; use sqlite:///path")
        else:
            path = uri
        if path != ":memory:":
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        self.path = path
        with contextlib.closing(self._conn()) as con, con:
            con.execute(
                "create table if not exists lakehouse_tables ("
                " namespace text not null,"
                " name text not null,"
                " metadata_location text not null,"
                " primary key (namespace, name))"
            )
            con.execute(
                "create table if not exists lakehouse_namespaces ("
                " namespace text primary key)"
            )

    def _conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.path, timeout=30.0)
        con.isolation_level = None  # explicit transactions only
        return con

    # ---------------------------------------------------------- namespaces --

    def create_namespace(self, namespace: str) -> None:
        with contextlib.closing(self._conn()) as con, con:
            con.execute(
                "insert or ignore into lakehouse_namespaces values (?)", (namespace,)
            )

    def list_namespaces(self) -> list[str]:
        with contextlib.closing(self._conn()) as con, con:
            rows = con.execute(
                "select namespace from lakehouse_namespaces"
                " union select distinct namespace from lakehouse_tables"
                " order by 1"
            ).fetchall()
        return [r[0] for r in rows]

    # -------------------------------------------------------------- tables --

    def register_table(self, namespace: str, name: str, metadata_location: str) -> None:
        """Atomically claim ``namespace.name`` — the multi-writer arbiter.

        Raises FileExistsError if any process (including this one) already
        registered it; the PK constraint decides the race, not a check-then-
        insert window.
        """
        with contextlib.closing(self._conn()) as con, con:
            con.execute("begin immediate")
            try:
                con.execute(
                    "insert into lakehouse_tables values (?,?,?)",
                    (namespace, name, metadata_location),
                )
                con.execute(
                    "insert or ignore into lakehouse_namespaces values (?)",
                    (namespace,),
                )
                con.execute("commit")
            except sqlite3.IntegrityError:
                con.execute("rollback")
                raise FileExistsError(
                    f"table {namespace}.{name} already registered"
                ) from None

    def load_location(self, namespace: str, name: str) -> str:
        with contextlib.closing(self._conn()) as con, con:
            row = con.execute(
                "select metadata_location from lakehouse_tables"
                " where namespace=? and name=?",
                (namespace, name),
            ).fetchone()
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
        with contextlib.closing(self._conn()) as con, con:
            rows = con.execute(
                "select name from lakehouse_tables where namespace=? order by 1",
                (namespace,),
            ).fetchall()
        return [r[0] for r in rows]

    def drop_table(self, namespace: str, name: str) -> None:
        with contextlib.closing(self._conn()) as con, con:
            con.execute("begin immediate")
            con.execute(
                "delete from lakehouse_tables where namespace=? and name=?",
                (namespace, name),
            )
            con.execute("commit")

    def rename_table(self, src_ns: str, src: str, dst_ns: str, dst: str) -> None:
        """Metadata-only pointer rename: the table directory never moves, so
        rename is O(1) regardless of table size (vs. the filesystem
        catalog's dir move + log path rewrite)."""
        with contextlib.closing(self._conn()) as con, con:
            con.execute("begin immediate")
            try:
                taken = con.execute(
                    "select 1 from lakehouse_tables where namespace=? and name=?",
                    (dst_ns, dst),
                ).fetchone()
                if taken:
                    raise FileExistsError(f"table {dst_ns}.{dst} already exists")
                cur = con.execute(
                    "update lakehouse_tables set namespace=?, name=?"
                    " where namespace=? and name=?",
                    (dst_ns, dst, src_ns, src),
                )
                if cur.rowcount == 0:
                    raise FileNotFoundError(f"no such table {src_ns}.{src}")
                con.execute(
                    "insert or ignore into lakehouse_namespaces values (?)", (dst_ns,)
                )
                con.execute("commit")
            except BaseException:
                con.execute("rollback")
                raise
