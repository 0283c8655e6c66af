"""Local differential verifier mimicking the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at the given
sf dir, then compares row count, column names/types, and order-insensitive
values cell-by-cell (exact equality — the corpus is designed so floats are
bit-identical across engines).

Usage: python tools/verify_local.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, ".")


def canon(df) -> tuple[list[str], list[tuple]]:
    """pandas frame -> (sorted column names, row-sorted tuples of values)."""
    cols = sorted(df.columns)
    out = df[cols]
    rows = []
    for row in out.itertuples(index=False):
        rows.append(tuple(_norm(v) for v in row))
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return cols, rows


def _norm(v):
    """Type-TAGGED canonical cell.

    The driver's value hash distinguishes int64 from float64 (round 10's
    one red row: DuckDB HUGEINT sum -> pandas float64 vs Spark bigint, 5
    vs 5.0) and NaN from NULL.  Python ``==`` does neither (5 == 5.0,
    and the old code folded NaN to None), which let a driver-red query
    pass the local gate.  Tagging each cell with its type family makes
    local equality at least as strict as the driver's hash, restoring
    the round-3 contract that local-green implies driver-green.
    """
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if v is pd.NaT:
        return ("nat",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("nan",) if math.isnan(f) else ("f", f)
    if isinstance(v, decimal.Decimal):
        # Both engines surface DECIMAL results as float64 via pandas; a
        # raw Decimal cell therefore hashes as its float rendering.
        return ("f", float(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.to_pydatetime())
    if isinstance(v, datetime.datetime):
        return ("t", v)
    if isinstance(v, datetime.date):
        return ("date", v)
    if isinstance(v, (np.ndarray, list)):
        return tuple(_norm(x) for x in v)
    return v


def _numeric_family(dtype) -> str | None:
    """pandas dtype -> "i"/"f" for the int-vs-float asymmetry class, else None.

    This is the one dtype class the driver's hash is PROVEN to distinguish
    at the frame level (round 10: DuckDB HUGEINT sum -> float64 vs Spark
    bigint).  Object/datetime columns are left to the cell-wise strict
    compare — their pandas kinds legitimately differ between engines.
    """
    kind = getattr(dtype, "kind", None)
    if kind in ("i", "u"):
        return "i"
    if kind == "f":
        return "f"
    return None


def run(sf_dir: str, filters: list[str] | None = None, quiet: bool = False):
    """Full strict differential: every registered query vs its DuckDB oracle.

    Returns (passed, failed, rows_only) where failed is [(name, reason)].
    Used by the CLI below AND by tests/test_oracle_dtype_parity.py so a new
    oracle with a driver-visible dtype asymmetry fails in pytest, not in a
    driver window (VERDICT r10 task #2).
    """
    import duckdb

    from pyiceberg_lakehouse_spark.registry import (
        DRIVER_WINDOW,
        ORACLE,
        QUERIES,
        load_all,
    )
    from pyiceberg_lakehouse_spark.session import get_spark
    from pyiceberg_lakehouse_spark.sources.testdata import TABLES

    load_all()
    spark = get_spark("verify-local")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    def say(msg: str) -> None:
        if not quiet:
            print(msg)

    names = [n for n in sorted(QUERIES) if not filters or any(f in n for f in filters)]
    passed, failed, rows_only = [], [], []
    for name in names:
        t0 = time.time()
        try:
            spark_df = QUERIES[name](spark, sf_dir)
            if name in DRIVER_WINDOW:
                # The driver's canonicalizer sorts rows with pandas
                # Categorical, which cannot hash ndarray/dict cells.  Reject
                # complex-typed columns HERE (no tuple-izing) so local-green
                # always implies driver-green (VERDICT r3 task #2).
                from pyspark.sql import types as T

                complex_cols = [
                    f.name
                    for f in spark_df.schema.fields
                    if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
                ]
                if complex_cols:
                    failed.append(
                        (name, f"driver-window query returns complex-typed "
                               f"columns {complex_cols} — the driver cannot "
                               f"hash these; flatten (array_join/to_json)")
                    )
                    say(f"FAIL  {name}  (complex column in driver window)")
                    continue
            sdf = spark_df.toPandas()
        except Exception:
            failed.append((name, "SPARK ERROR:\n" + traceback.format_exc(limit=8)))
            say(f"FAIL  {name}  (spark error)")
            continue
        if name not in ORACLE:
            rows_only.append(name)
            say(f"rows-only  {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(ORACLE[name]).fetchdf()
        except Exception:
            failed.append((name, "ORACLE ERROR:\n" + traceback.format_exc(limit=8)))
            say(f"FAIL  {name}  (oracle error)")
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            failed.append((name, f"columns differ: spark={scols} oracle={ocols}"))
            say(f"FAIL  {name}  (columns)")
            continue
        dtype_bad = []
        for c in scols:
            sfam = _numeric_family(sdf[c].dtype)
            ofam = _numeric_family(odf[c].dtype)
            if sfam and ofam and sfam != ofam:
                dtype_bad.append(f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
        if dtype_bad:
            failed.append((name, "int/float dtype asymmetry (driver hash "
                                 "distinguishes these): " + "; ".join(dtype_bad)))
            say(f"FAIL  {name}  (dtype family)")
            continue
        if len(srows) != len(orows):
            failed.append((name, f"row count: spark={len(srows)} oracle={len(orows)}"))
            say(f"FAIL  {name}  (rowcount)")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failed.append((name, f"value mismatch at sorted row {bad[0]}:\n  spark={bad[1]}\n  oracle={bad[2]}"))
            say(f"FAIL  {name}  (values)")
            continue
        passed.append(name)
        say(f"PASS  {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")

    say(f"\n=== {len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only ===")
    return passed, failed, rows_only


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    passed, failed, rows_only = run(sf_dir, filters)
    for name, why in failed:
        print(f"\n--- {name} ---\n{why}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
