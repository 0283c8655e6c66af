"""Engine-agnostic exact-math helpers shared by queries and their oracles."""

from pyiceberg_lakehouse_spark.functions.exact import davg, dot_product_exact, dsum

__all__ = ["davg", "dot_product_exact", "dsum"]
