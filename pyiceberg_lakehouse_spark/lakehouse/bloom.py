"""Per-file bloom filters for point-lookup file skipping.

Min/max bounds (stats.py) prune range predicates, but an equality probe on a
high-cardinality key (``o_orderkey = 4242``) defeats them: every file's
[min, max] spans the key space, so nothing skips. Iceberg solves this with
per-file bloom filters in the manifest; we store the same thing in the
snapshot log: ``bloom: {col: {m, k, bits}}`` per file entry, built in ONE
distributed pass over the freshly written files at commit time.

Hashing is Spark's ``xxhash64`` (JVM-side, whole-stage codegen) with the
Kirsch-Mitzenmacher double-hashing scheme: position_i = (h1 + i*h2) mod m,
h1 = xxhash64(col), h2 = xxhash64(col, 'bloom2'). The probe computes the
same positions through a 1-row Spark job, so build and probe can never
disagree on the hash function.

Sizing: the default m=8192 bits (1 KiB/file/column) at k=4 holds ~1%
false positives up to ~800 distinct keys per file and saturates (FP -> 1,
no pruning) past a few thousand — size ``write.bloom-bits`` to ~10x the
expected distinct keys per file (and optionally ``write.bloom-hashes``).
At 100 TB with 512 MB files of ~500k distinct keys that's m ~ 5M bits =
640 KiB/file/column → ~120 GB of bloom metadata per column across 200k
files, which no longer fits one driver JSON log comfortably — at that
scale store blooms per-file-sidecar and load lazily; within this repo's
metadata budget the dial covers the tested range honestly.
"""

from __future__ import annotations

import base64
from typing import Any
from urllib.parse import unquote, urlparse

from pyspark.sql import SparkSession

from pyiceberg_lakehouse_spark.localdf import local_rows_df
from pyspark.sql import functions as F

DEFAULT_M = 8192
DEFAULT_K = 4


def _positions(col: F.Column, m: int, k: int) -> F.Column:
    """Array of k bit positions for each value (double hashing).

    The combination runs entirely mod m — (h1 mod m) + i*(h2 mod m) stays
    below k*m, so ANSI mode never sees a long overflow.
    """
    h1 = F.pmod(F.xxhash64(col), F.lit(m))
    h2 = F.pmod(F.xxhash64(col, F.lit("bloom2")), F.lit(m))
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)])


def build_file_blooms(
    spark: SparkSession,
    paths: list[str],
    columns: list[str],
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> dict[str, dict[str, dict[str, Any]]]:
    """path -> {col -> bloom descriptor} in one distributed pass.

    The pass is a scan of the just-written files projecting only the bloom
    columns, a map-side explode to (file, col, position), and a distinct —
    at most ``files * cols * m`` rows survive to the driver (positions are
    deduplicated executor-side), so driver memory is bounded by the bitmap
    size, not the row count.
    """
    if not paths or not columns:
        return {}
    df = spark.read.parquet(*paths).select(
        F.input_file_name().alias("_file"), *columns
    )
    # xxhash64 hashes int and bigint (and float/double) DIFFERENTLY for the
    # same numeric value, so the probe must cast its literal to the column's
    # exact type — record it in the descriptor.
    col_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    pos_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                _positions(F.col(c), m, k).alias("pos_arr"),
            )
            for c in columns
        ]
    )
    exploded = (
        df.select("_file", F.explode(pos_structs).alias("s"))
        .select("_file", F.col("s.col").alias("col"), F.explode("s.pos_arr").alias("pos"))
        .distinct()
        .groupBy("_file", "col")
        .agg(F.collect_list("pos").alias("positions"))
    )
    out: dict[str, dict[str, dict[str, Any]]] = {}
    for row in exploded.collect():
        # input_file_name returns a URI (file:///abs/path, percent-encoded);
        # log entries store plain filesystem paths
        parsed = urlparse(row["_file"])
        path = unquote(parsed.path) if parsed.scheme else row["_file"]
        bits = bytearray((m + 7) // 8)
        for p in row["positions"]:
            bits[p // 8] |= 1 << (p % 8)
        out.setdefault(path, {})[row["col"]] = {
            "m": m,
            "k": k,
            "type": col_types[row["col"]],
            "bits": base64.b64encode(bytes(bits)).decode("ascii"),
        }
    return out


def probe_positions(
    spark: SparkSession, value: Any, m: int, k: int, dtype: str | None = None
) -> list[int]:
    """Bit positions for a probe value — same Spark hash path as the build."""
    lit = F.lit(value)
    if dtype is not None:
        lit = lit.cast(dtype)
    row = spark.range(1).select(_positions(lit, m, k).alias("pos")).collect()[0]
    return list(row["pos"])


def might_contain(bloom: dict[str, Any], positions: list[int]) -> bool:
    """True unless some probed bit is unset (definite absence)."""
    bits = base64.b64decode(bloom["bits"])
    return all(bits[p // 8] & (1 << (p % 8)) for p in positions)


def prune_files_bloom(
    spark: SparkSession,
    files: list[dict[str, Any]],
    probes: dict[str, Any],
) -> list[dict[str, Any]]:
    """Drop files whose bloom filter proves a probed key is absent.

    ``probes`` maps column -> equality value. Files without a bloom for a
    probed column are kept (skipping must stay conservative). Probe hashes
    are computed once per (column, m, k) combination, not per file.
    """
    pos_cache: dict[tuple, list[int]] = {}
    out = []
    for f in files:
        blooms = f.get("bloom") or {}
        keep = True
        for col, value in probes.items():
            b = blooms.get(col)
            if b is None:
                continue
            key = (col, b["m"], b["k"], b.get("type"))
            if key not in pos_cache:
                pos_cache[key] = probe_positions(
                    spark, value, b["m"], b["k"], b.get("type")
                )
            if not might_contain(b, pos_cache[key]):
                keep = False
                break
        if keep:
            out.append(f)
    return out


def probe_positions_many(
    spark: SparkSession,
    values: list[Any],
    m: int,
    k: int,
    dtype: str | None = None,
) -> dict[Any, list[int]]:
    """value -> bit positions for a SET of probe values, in ONE Spark job.

    The join-driven probe (`prune_files_bloom_any`) hashes every dim key;
    doing that one key at a time would cost a Spark job per key. The values
    ride a single local DataFrame instead — same ``_positions`` expression
    as the build, so hashes can never diverge."""
    if not values:
        return {}
    df = local_rows_df(
        spark, [(v,) for v in values], f"value {dtype or 'bigint'}"
    )
    rows = df.select(
        "value", _positions(F.col("value"), m, k).alias("pos")
    ).collect()
    return {r["value"]: list(r["pos"]) for r in rows}


def prune_files_bloom_any(
    spark: SparkSession,
    files: list[dict[str, Any]],
    col: str,
    values: list[Any],
) -> list[dict[str, Any]]:
    """Drop files whose bloom proves EVERY probed key absent (IN-list /
    join-key semantics: a file survives if ANY key might be present).

    This is the file-granular half of a bloom-reduced join: the dim side's
    (bounded) key set probes each fact file's bloom, so files holding none
    of the keys are never planned, let alone read. Files without a bloom
    for ``col`` are kept — skipping stays conservative and the join owns
    correctness. Probe hashes are computed once per (m, k, type) descriptor
    shape, one Spark job each, never per file."""
    pos_cache: dict[tuple, dict[Any, list[int]]] = {}
    out = []
    for f in files:
        b = (f.get("bloom") or {}).get(col)
        if b is None:
            out.append(f)
            continue
        key = (b["m"], b["k"], b.get("type"))
        if key not in pos_cache:
            pos_cache[key] = probe_positions_many(
                spark, values, b["m"], b["k"], b.get("type")
            )
        if any(might_contain(b, pos) for pos in pos_cache[key].values()):
            out.append(f)
    return out
