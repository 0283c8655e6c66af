"""Data sources: testdata loaders, schema inference, strict-cast ingest."""

from pyiceberg_lakehouse_spark.sources.inference import (
    arrow_field_to_spark,
    arrow_type_to_spark,
    discover_files,
    infer_spark_schema,
)
from pyiceberg_lakehouse_spark.sources.ingest import IngestReport, ingest_files, strict_cast
from pyiceberg_lakehouse_spark.sources.testdata import (
    SCHEMAS,
    TABLES,
    load_table,
    register_views,
)

__all__ = [
    "SCHEMAS",
    "TABLES",
    "IngestReport",
    "arrow_field_to_spark",
    "arrow_type_to_spark",
    "discover_files",
    "infer_spark_schema",
    "ingest_files",
    "load_table",
    "register_views",
    "strict_cast",
]
