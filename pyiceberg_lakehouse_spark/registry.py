"""Query registry backing the driver contract (__spark_entry__.py).

Every operator module registers its queries here: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string over the same parquet tables. The driver compares the two at
sf=0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased IDENTICALLY on both sides;
- float aggregates go through exact decimal arithmetic (functions.exact) so
  Spark and DuckDB produce bitwise-identical doubles regardless of
  accumulation order — the comparison never depends on float tolerance.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it rows-only (non-SQL ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver's correctness sweep samples the FIRST 50 registry entries in
# insertion order. These 50 are hand-picked to span every engine category —
# scans/filters, core relational, pandas-UDF surface, TPC-H shapes,
# lakehouse lifecycle, dedup/ANN, text/multimodal, training-data, streaming
# — so the externally-visible gate exercises the whole engine, not just the
# first modules imported. Everything not listed follows in registration
# order and is verified by the identical local gate (tools/verify_local.py).
# A handful of proven-stable slots rotate each round to queries that have
# never had a driver row, growing the driver-verified set over time while
# keeping every category represented.
#
# Round-6 rotation (13 slots, double the usual pace per VERDICT r5 task #1):
# rotated OUT thirteen multi-round-green rows (ts_gapfill_hourly,
# filter_exists_correlated, sql_grouping_sets, join_multiway_revenue,
# win_running_sum, set_union_all, cast_whole_table, filter_scalar_subquery,
# agg_q5_local_supplier_volume, lh_time_travel, lh_cdc_apply,
# stream_stream_join, dedup_ngram_jaccard); rotated IN twelve
# never-driver-verified queries prioritizing the lakehouse lifecycle/
# maintenance cluster, plus the new lh_ann_refresh_selfcheck differential.
DRIVER_WINDOW: tuple[str, ...] = (
    # parquet scans + filters
    "scan_region",
    "scan_glob_schema_enforced",
    "filter_eq",
    # core aggregation (flagship first)
    "agg_q1_pricing_summary",
    "agg_rollup",
    "agg_keep_last",
    "agg_salted_groupby",
    # joins
    "join_inner_agg",
    "join_broadcast_parts",
    "join_full_outer",
    "join_asof",
    # windows / sort / set ops / time series
    "win_topk_per_group",
    "sort_topk_global",
    "events_session_windows",
    # scalar functions, casts, subqueries
    "fn_array_higher_order",
    "fn_from_json_struct",
    # pandas-UDF surface
    "fn_pandas_scalar",
    "fn_grouped_pandas_demean",
    # TPC-H shapes
    "agg_q3_shipping_priority",
    "agg_q18_large_orders",
    "agg_q19_discounted_revenue",
    # lakehouse lifecycle + maintenance (r6 rotation: first driver rows for
    # compact, partition evolution, rollback, bloom pruning, hidden
    # month-partitioning)
    "lh_ingest_roundtrip",
    "lh_upsert",
    "lh_zorder_scan",
    "lh_commit_batching",
    "lh_merge_on_read_delete",
    "lh_incremental_read",
    "lh_branch_merge",
    "lh_schema_evolution",
    "lh_ann_indexed_selfcheck",
    "lh_ann_refresh_selfcheck",
    "lh_compact_roundtrip",
    "lh_partition_evolution",
    "lh_rollback",
    "lh_bloom_point_lookup",
    "lh_hidden_partition_month",
    # dedup + similarity (ngram_jaccard rotated out in r6 for the new
    # refresh selfcheck; exact + embedding-cosine keep the category covered)
    "dedup_exact",
    "sim_cosine_topk",
    "dedup_embedding_cosine",
    # text + multimodal
    "text_lang_id",
    "text_tfidf_top_terms",
    "text_pii_scrub",
    "multimodal_resize",
    # training-data ops
    "train_balance_labels",
    "train_stratified_sample",
    "train_mix_weighted",
    "pipeline_clean_corpus",
    # structured streaming (r6 rotation: first driver rows for WAP publish
    # and the new continuous-ANN-ingestion composition; tumbling rotated
    # out after three green rounds)
    "stream_lh_ann_ingest",
    "stream_lh_cdc_apply",
    "stream_lh_wap_publish",
)


def load_all() -> None:
    """Import every module that registers queries (idempotent), then order
    the registry so ``DRIVER_WINDOW`` comes first."""
    import pyiceberg_lakehouse_spark.queries.relational  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_ext  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_ext2  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_tpch  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_tpch2  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_ext3  # noqa: F401
    import pyiceberg_lakehouse_spark.operators.queries  # noqa: F401
    import pyiceberg_lakehouse_spark.lakehouse.queries  # noqa: F401
    import pyiceberg_lakehouse_spark.streaming.queries  # noqa: F401
    import pyiceberg_lakehouse_spark.streaming.queries2  # noqa: F401
    import pyiceberg_lakehouse_spark.streaming.queries_lakehouse  # noqa: F401
    import pyiceberg_lakehouse_spark.sources.synthetic  # noqa: F401

    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    assert not missing, f"DRIVER_WINDOW names unknown queries: {missing}"
    ordered = {n: QUERIES[n] for n in DRIVER_WINDOW}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
