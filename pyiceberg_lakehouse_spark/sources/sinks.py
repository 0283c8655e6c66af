"""Parquet sink variants (W1-W5): partitioned hive, flat filename-encoded
layout, single-file table.

The reference writes the same logical partitioning three physical ways
(SURVEY.md §1.3); these helpers reproduce each on Spark:

- W1/W2: engine-native hive layout  -> ``write_partitioned``
  (main-daft.py:69; identical result to the manual per-value loops of
  main-polars-ray.py:66-72 in ONE pass, not V passes)
- W3: flat layout, partition value only in the filename -> ``write_flat``
  (main-polars.py:115-119; partition info stays in metadata, which our
  snapshot log models as per-file partition values)
- W5: single-file table -> ``write_single_file`` (upsert.py:80-81)
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], compression: str = "zstd"
) -> list[str]:
    """Hive-layout partitioned write (single shuffle-free pass)."""
    df.write.mode("overwrite").option("compression", compression).partitionBy(
        *partition_by
    ).parquet(path)
    return sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def write_flat(
    df: DataFrame, path: str, partition_by: str, compression: str = "zstd"
) -> dict[str, str]:
    """Flat layout: one file per partition value, value encoded in the NAME.

    Writes hive layout first (one distributed pass), then renames — the
    reference instead re-filters the whole dataset once per distinct value
    (main-polars.py:113-119), which SURVEY.md §4 flags as an anti-pattern.
    Returns {partition_value: file_path}.
    """
    staging = path + ".staging"
    df.write.mode("overwrite").option("compression", compression).partitionBy(
        partition_by
    ).parquet(staging)
    os.makedirs(path, exist_ok=True)
    out: dict[str, str] = {}
    for part_dir in sorted(_glob.glob(os.path.join(staging, f"{partition_by}=*"))):
        value = os.path.basename(part_dir).split("=", 1)[1]
        files = sorted(_glob.glob(os.path.join(part_dir, "*.parquet")))
        if len(files) == 1:
            dest = os.path.join(path, f"data_{partition_by}_{value}.parquet")
            shutil.move(files[0], dest)
            out[value] = dest
        else:
            for i, f in enumerate(files):
                dest = os.path.join(path, f"data_{partition_by}_{value}_{i}.parquet")
                shutil.move(f, dest)
                out[value] = os.path.join(path, f"data_{partition_by}_{value}_*.parquet")
    shutil.rmtree(staging)
    return out


def write_single_file(df: DataFrame, path: str, compression: str = "zstd") -> str:
    """Single parquet file (coalesce(1)) — the reference's merged-upsert
    temp write. Driver-side rename gives the exact target filename."""
    staging = path + ".staging"
    df.coalesce(1).write.mode("overwrite").option("compression", compression).parquet(
        staging
    )
    part = _glob.glob(os.path.join(staging, "*.parquet"))[0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    shutil.move(part, path)
    shutil.rmtree(staging)
    return path
