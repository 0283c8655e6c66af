from pyiceberg_lakehouse_spark.sources.testdata import TABLES, load_table, register_views
from pyiceberg_lakehouse_spark.sources.inference import infer_spark_schema, arrow_field_to_spark
from pyiceberg_lakehouse_spark.sources.ingest import strict_cast, ingest_files

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "infer_spark_schema",
    "arrow_field_to_spark",
    "strict_cast",
    "ingest_files",
]
