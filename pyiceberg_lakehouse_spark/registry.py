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
# Round-7 rotation (25 first-time slots — the largest yet, per VERDICT r6
# task #2: the 17 TPC-H shapes that had never held a driver slot are the
# highest-latent-defect-risk unverified queries). Rotated OUT 25 rows
# green >= 2 consecutive rounds (scan_region, filter_eq, agg_rollup,
# join_inner_agg, join_broadcast_parts, join_asof, win_topk_per_group,
# sort_topk_global, fn_array_higher_order, fn_pandas_scalar, agg_q3,
# agg_q19, lh_ingest_roundtrip, lh_upsert, lh_zorder_scan,
# lh_commit_batching, lh_merge_on_read_delete, lh_incremental_read,
# lh_branch_merge, dedup_embedding_cosine, stream_lh_cdc_apply,
# train_balance_labels, train_stratified_sample, text_lang_id,
# text_tfidf_top_terms); rotated IN all 17 never-verified TPC-H
# topologies, four lakehouse backfills (lh_sql_read, lh_expire_snapshots,
# lh_delete_where, lh_datasource_pushdown_scan), the bounded-window-frame
# query, and this round's three brand-new operators
# (train_decontaminate, text_repetition_stats, text_subword_tokens).
# Every engine category keeps at least one recently-green representative.
DRIVER_WINDOW: tuple[str, ...] = (
    # parquet scans + filters
    "scan_glob_schema_enforced",
    # core aggregation (flagship first)
    "agg_q1_pricing_summary",
    "agg_keep_last",
    "agg_salted_groupby",
    # joins
    "join_full_outer",
    # windows / sort / time series (win_bounded_frame: never-verified
    # window-frame query takes the windows slot)
    "win_bounded_frame",
    "events_session_windows",
    # scalar functions
    "fn_from_json_struct",
    # pandas-UDF surface
    "fn_grouped_pandas_demean",
    # TPC-H shapes: the full never-driver-verified batch (r7 rotation)
    "agg_q2_min_cost_supplier",
    "agg_q4_priority_check",
    "agg_q6_forecast_revenue",
    "agg_q7_volume_shipping",
    "agg_q8_market_share",
    "agg_q9_product_profit",
    "agg_q10_returned_items",
    "agg_q11_important_stock",
    "agg_q12_shipping_lag",
    "agg_q13_customer_distribution",
    "agg_q14_promo_share",
    "agg_q15_top_supplier",
    "agg_q16_supplier_variety",
    "agg_q17_small_quantity_revenue",
    "agg_q18_large_orders",
    "agg_q20_potential_promotion",
    "agg_q21_suppliers_kept_waiting",
    "agg_q22_global_sales_opportunity",
    # lakehouse lifecycle + maintenance (r6 first-timers held for a second
    # round; + r7 backfills: SQL read, expiry, copy-on-write delete, the
    # registered Spark data source's pushdown scan)
    "lh_schema_evolution",
    "lh_ann_indexed_selfcheck",
    "lh_ann_refresh_selfcheck",
    "lh_compact_roundtrip",
    "lh_partition_evolution",
    "lh_rollback",
    "lh_bloom_point_lookup",
    "lh_hidden_partition_month",
    "lh_sql_read",
    "lh_expire_snapshots",
    "lh_delete_where",
    "lh_datasource_pushdown_scan",
    # dedup + similarity
    "dedup_exact",
    "sim_cosine_topk",
    # text + multimodal (lang_id/tfidf — 3 and 2 rounds green — rotate out
    # for this round's two new text operators; pii_scrub stays as the
    # category's proven-green row. multimodal_frame_sample, also new this
    # round, waits for the r8 rotation so multimodal keeps a green row.)
    "text_repetition_stats",
    "text_subword_tokens",
    "text_pii_scrub",
    "multimodal_resize",
    # training-data ops (balance_labels and stratified_sample rotated out
    # — 3 and 2 rounds green — for the windows slot and the brand-new
    # decontamination operator, this round's newest code)
    "train_decontaminate",
    "train_mix_weighted",
    "pipeline_clean_corpus",
    # structured streaming
    "stream_lh_ann_ingest",
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
