"""pyiceberg_lakehouse_spark — a PySpark-native lakehouse + analytics engine.

A from-scratch rebuild of the capabilities of the reference repo
``ashkangoleh/pyiceberg-lakehouse`` (a PyIceberg lakehouse workflow driven by
Daft/Polars/Arrow/Ray), re-expressed Spark-first:

- lakehouse lifecycle: create / append / transactional-append / overwrite /
  add_files / upsert / history / time-travel / compaction, backed by
  partitioned Parquet plus a per-table JSON snapshot log
  (``lakehouse/``; reference: main-daft.py, main-polars.py, upsert.py),
- a full relational query surface (scans, filters, aggregations, joins,
  windows, set ops, scalar functions) on the Spark DataFrame/SQL API
  (``queries/relational.py``),
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  multimodal column plumbing (``operators/``),
- Structured Streaming coverage over event streams (``streaming/``).

Everything is declarative DataFrame/SQL so Catalyst plans the physical
execution; Python UDFs appear only where Spark builtins genuinely cannot
express the semantics (and then as Arrow-vectorized pandas UDFs).
"""

from pyiceberg_lakehouse_spark.session import get_spark, ensure_runtime_confs

__all__ = ["get_spark", "ensure_runtime_confs"]
__version__ = "0.1.0"
