"""Strict-cast ingestion with per-file error isolation.

The reference reads each discovered file, strict-casts it to the canonical
schema, and appends — catching per-file failures and continuing
(main-daft.py:121-138, the ``try: ... except: continue`` at 134-136). Arrow's
``cast`` raises on lossy conversion while Spark's ``cast`` silently
nulls/wraps, so we reproduce strictness with ``try_cast`` + a null-check
count: a file whose cast produces new nulls is rejected, not silently
corrupted (SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def strict_cast(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast ``df`` to ``schema`` exactly; raise if any value would be lost.

    Equivalent of Arrow's strict ``table.cast(schema)`` (main-daft.py:133,
    upsert.py:36): columns are matched by name, extra columns are an error,
    lossy values are an error. One distributed pass computes all per-column
    violation counts (no per-column jobs).
    """
    want = {f.name for f in schema.fields}
    have = set(df.columns)
    if have != want:
        raise ValueError(f"schema mismatch: missing={sorted(want - have)} extra={sorted(have - want)}")

    casted = df.select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    # a try_cast that yields NULL from a non-NULL input is a lossy conversion
    def null_counts(frame: DataFrame) -> DataFrame:
        return frame.select(
            *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in frame.columns]
        )

    before = null_counts(df)
    after = null_counts(casted)
    b, a = before.collect()[0], after.collect()[0]
    bad = {c: a[c] - (b[c] or 0) for c in df.columns if (a[c] or 0) > (b[c] or 0)}
    if bad:
        raise ValueError(f"strict cast would lose values: {bad}")
    return casted


@dataclass
class IngestReport:
    """Mirrors the reference's printed per-file progress (main-daft.py:138)."""

    ok_files: list[str] = field(default_factory=list)
    failed: dict[str, str] = field(default_factory=dict)
    rows: int = 0


def ingest_files(
    spark: SparkSession,
    files: list[str],
    schema: T.StructType,
    sink,  # callable(DataFrame) -> None, e.g. LakehouseTable.append
) -> IngestReport:
    """Per-file read -> strict cast -> sink, skipping bad files.

    Reproduces main-daft.py:121-138 semantics (one sink call per file; error
    isolation per file). For the single-snapshot variant, union the files
    first and call the sink once (main-polars.py:165-186 / W7).
    """
    report = IngestReport()
    for path in files:
        try:
            df = strict_cast(spark.read.parquet(path), schema)
            sink(df)
            report.ok_files.append(path)
            report.rows += df.count()
        except Exception as exc:  # per-file isolation, main-daft.py:134-136
            report.failed[path] = str(exc)
    return report


def read_csv_checked(
    spark,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """CSV ingestion with corrupt-record ISOLATION: returns
    ``(good_rows, bad_records)``.

    PERMISSIVE mode captures unparseable lines in ``_corrupt_record``
    instead of failing the job (one poisoned line in a 100 TB drop must
    not kill the ingest) — good rows flow on schema-typed, bad raw lines
    are returned for quarantine. Spark refuses a plan referencing ONLY the
    internal corrupt column over an uncached source, so the raw batch is
    cache()d: the cached unit is the INGEST BATCH (bounded by the drop
    being loaded), never the table; the caller unpersists after the
    quarantine side is drained."""
    read_schema = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType(), True)]
    )
    opts = {
        "header": str(header).lower(),
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": "_corrupt_record",
    }
    raw = spark.read.options(**opts).schema(read_schema).csv(path).cache()
    good = raw.filter(F.col("_corrupt_record").isNull()).select(
        *[F.col(f.name) for f in schema.fields]
    )
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def read_json_checked(
    spark,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingestion with corrupt-record isolation — same contract
    as :func:`read_csv_checked`."""
    read_schema = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType(), True)]
    )
    raw = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(read_schema)
        .json(path)
        .cache()
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).select(
        *[F.col(f.name) for f in schema.fields]
    )
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def read_fwf_checked(
    spark,
    path: str,
    fields: list[tuple[str, int, int, str]],
) -> tuple[DataFrame, DataFrame]:
    """Fixed-width-field ingestion (the mainframe/legacy-export format)
    with per-line validation QUARANTINE: returns ``(good_rows,
    bad_lines)``.

    ``fields``: (name, start, width, dtype) with 0-based byte offsets.
    A line is quarantined — never failed on, never leaked as a typed
    row — when it is shorter than the declared record width or when a
    non-blank slice refuses its declared cast (blank slices become
    NULL, the fixed-width convention). Parsing is pure Column work
    (substring/trim/cast): one codegen span per file split, no Python
    in the plan — the same isolation contract as read_csv_checked."""
    record_width = max(start + width for _n, start, width, _t in fields)
    raw = spark.read.text(path)
    valid = F.length("value") >= F.lit(record_width)
    typed = []
    for name, start, width, dtype in fields:
        sliced = F.trim(F.substring("value", start + 1, width))
        # try_cast: malformed input must flow to quarantine, not throw
        # under ANSI mode
        cast = sliced.try_cast(dtype)
        valid = valid & (cast.isNotNull() | (sliced == ""))
        typed.append(
            F.when(sliced == "", F.lit(None)).otherwise(cast).alias(name)
        )
    good = raw.filter(valid).select(*typed)
    bad = raw.filter(~valid).select(F.col("value").alias("raw_line"))
    return good, bad
