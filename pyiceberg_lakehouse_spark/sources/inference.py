"""Schema inference: Parquet/Arrow schema -> Spark StructType.

Mirrors the reference's footer-probe inference (main-daft.py:41-59): read one
file's footer, map each field with a deliberately narrow mapping
(integer -> IntegerType, float -> FloatType, string -> StringType) and fall
back to StringType for anything unrecognized (main-daft.py:55-56), keeping
``nullable`` from the source field (main-daft.py:57).

We extend the mapping with the types the driver testdata actually uses
(int64, float64, timestamps, list<float>) — the reference's own bit-width
aware variant is main-polars-lazy.py:11-44.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T


def arrow_field_to_spark(field: pa.Field) -> T.StructField:
    """Map one Arrow field to a Spark StructField (narrow map + fallback)."""
    return T.StructField(field.name, arrow_type_to_spark(field.type), field.nullable)


def arrow_type_to_spark(at: pa.DataType) -> T.DataType:
    """Narrow Arrow->Spark type mapping with StringType fallback.

    Dictionary-encoded columns map to their value type (the reference
    materializes dictionaries before append, main-daft.py:126-132; Spark's
    parquet reader decodes them transparently).
    """
    if pa.types.is_dictionary(at):
        return arrow_type_to_spark(at.value_type)
    if pa.types.is_boolean(at):
        return T.BooleanType()
    if pa.types.is_integer(at):
        # bit-width aware, like main-polars-lazy.py:29-38
        return T.LongType() if at.bit_width > 32 else T.IntegerType()
    if pa.types.is_float32(at):
        return T.FloatType()
    if pa.types.is_floating(at):
        return T.DoubleType()
    if pa.types.is_timestamp(at):
        # testdata stores naive timestamps; tz-less parquet -> NTZ
        return T.TimestampType() if at.tz else T.TimestampNTZType()
    if pa.types.is_date(at):
        return T.DateType()
    if pa.types.is_decimal(at):
        return T.DecimalType(at.precision, at.scale)
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return T.BinaryType()
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return T.ArrayType(arrow_type_to_spark(at.value_type))
    if pa.types.is_struct(at):
        return T.StructType([arrow_field_to_spark(at.field(i)) for i in range(at.num_fields)])
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return T.StringType()
    # fallback, mirroring main-daft.py:55-56
    return T.StringType()


def infer_spark_schema(path_or_pattern: str) -> T.StructType:
    """Probe ONE parquet footer and return the Spark schema.

    Footer-only — no data pages are read (S13, main-daft.py:45). Accepts a
    file, a directory, or a glob pattern; the first matching file wins, like
    the reference's ``glob()[0]``.
    """
    path = _first_parquet(path_or_pattern)
    arrow_schema = pq.read_schema(path)
    return T.StructType([arrow_field_to_spark(f) for f in arrow_schema])


def discover_files(path_or_pattern: str) -> list[str]:
    """Recursive parquet file discovery (S12, main-daft.py:110, upsert.py:24)."""
    if os.path.isdir(path_or_pattern):
        pattern = os.path.join(path_or_pattern, "**", "*.parquet")
    else:
        pattern = path_or_pattern
    return sorted(_glob.glob(pattern, recursive=True))


def _first_parquet(path_or_pattern: str) -> str:
    if os.path.isfile(path_or_pattern):
        return path_or_pattern
    files = discover_files(path_or_pattern)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path_or_pattern!r}")
    return files[0]
