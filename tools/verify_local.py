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
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v
    if isinstance(v, (np.ndarray, list)):
        return tuple(_norm(x) for x in v)
    return v


def main() -> int:
    import duckdb

    from pyiceberg_lakehouse_spark.registry import (
        DRIVER_WINDOW,
        ORACLE,
        QUERIES,
        load_all,
    )
    from pyiceberg_lakehouse_spark.session import get_spark
    from pyiceberg_lakehouse_spark.sources.testdata import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    load_all()
    spark = get_spark("verify-local")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

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
                    print(f"FAIL  {name}  (complex column in driver window)")
                    continue
            sdf = spark_df.toPandas()
        except Exception:
            failed.append((name, "SPARK ERROR:\n" + traceback.format_exc(limit=8)))
            print(f"FAIL  {name}  (spark error)")
            continue
        if name not in ORACLE:
            rows_only.append(name)
            print(f"rows-only  {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(ORACLE[name]).fetchdf()
        except Exception:
            failed.append((name, "ORACLE ERROR:\n" + traceback.format_exc(limit=8)))
            print(f"FAIL  {name}  (oracle error)")
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            failed.append((name, f"columns differ: spark={scols} oracle={ocols}"))
            print(f"FAIL  {name}  (columns)")
            continue
        if len(srows) != len(orows):
            failed.append((name, f"row count: spark={len(srows)} oracle={len(orows)}"))
            print(f"FAIL  {name}  (rowcount)")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failed.append((name, f"value mismatch at sorted row {bad[0]}:\n  spark={bad[1]}\n  oracle={bad[2]}"))
            print(f"FAIL  {name}  (values)")
            continue
        passed.append(name)
        print(f"PASS  {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")

    print(f"\n=== {len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only ===")
    for name, why in failed:
        print(f"\n--- {name} ---\n{why}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
