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
# Round-9 rotation (VERDICT r8 tasks #1/#2/#5: retire the driver-evidence
# tail). Rotated OUT every row green >= 2 consecutive rounds (all 18 TPC-H
# shapes verified in the r7+r8 windows, scan_glob_schema_enforced,
# agg_salted_groupby, win_bounded_frame, fn_from_json_struct,
# fn_grouped_pandas_demean, lh_schema_evolution, lh_sql_read,
# lh_expire_snapshots, lh_delete_where, lh_datasource_pushdown_scan,
# sim_cosine_topk — its r8 plan fix is machine-guarded by
# tests/test_plans.py — text_repetition_stats, text_subword_tokens,
# train_decontaminate) plus the rows-only dedup_group_components (an r8
# window slot that produced no hash evidence; per VERDICT r8 task #2 its
# oracle-checked twin dedup_components_exact takes the slot). Rotated IN
# ALL 26 never-driver-verified oracle-checkable queries (the 9 r8
# newcomers, the 8 long-tail scalar fns, and the 9 remaining singles) and
# the 5 queries NEW this round. The 16 r8 first-timers hold for their
# second green round. Stable anchors keep the heavyweight paths
# represented per the standing category contract
# (tests/test_entry_contract.py): the flagship pricing summary plus four
# structurally-diverse TPC-H topologies (deep join chain, big semi-join,
# multi-EXISTS, outer-join agg), the rewritten cosine top-k, and the
# reference's flagship upsert composite. Four of the eight long-tail
# fn_* queries (date_arithmetic, null_handling, posexplode,
# string_extended) wait for the r10 window — the five NEW queries
# outrank them for driver evidence.
DRIVER_WINDOW: tuple[str, ...] = (
    # parquet scans + synthetic source (never-verified)
    "scan_repartition_blocks",
    "synthetic_mock_dataset",
    # core aggregation (flagship anchor + never-verified shapes)
    "agg_q1_pricing_summary",
    "agg_conditional",
    "agg_unpivot",
    # joins: r8 first-timer holds + four structurally-diverse TPC-H
    # topology anchors (plan shapes of all 22 stay machine-checked in
    # tests/test_plans.py on every run)
    "join_right_outer",
    "agg_q9_product_profit",
    "agg_q13_customer_distribution",
    "agg_q18_large_orders",
    "agg_q21_suppliers_kept_waiting",
    # set ops (r8 first-timer holds + never-verified by-name union)
    "set_except_all",
    "set_union_missing_columns",
    # windows (never-verified ntile/cume_dist)
    "win_ntile_cume",
    # scalar-function long tail (VERDICT r8 task #5 — two of the eight
    # never-verified; the rest take r10 slots, outranked here by the NEW
    # lakehouse composites below, which are fresher code)
    "fn_try_arithmetic",
    "fn_regexp_extract_all",
    # time-series analytics (NEW this round: ordered funnel + retention)
    "events_funnel_steps",
    "events_retention_cohorts",
    # lakehouse lifecycle + maintenance (r8 first-timers hold;
    # never-verified rollups + ANN health->action; NEW avg rollup and NEW
    # incremental dedup index — the lh_upsert anchor yields its slot to
    # the fresh composite, upsert semantics stay covered by
    # lh_datasource_write_roundtrip + the CDC/upsert pytest suites)
    "lh_dedup_incremental",
    "lh_merge_into",
    "lh_type_promotion",
    "lh_datasource_write_roundtrip",
    "lh_sql_catalog_lifecycle",
    "lh_metadata_count",
    "lh_tag_read",
    "lh_rename_column",
    "lh_flat_layout_roundtrip",
    "lh_bucketed_colocated_join",
    "lh_rollup_incremental",
    "lh_rollup_hourly",
    "lh_rollup_avg",
    "lh_ann_auto_maintain",
    # dedup + similarity (VERDICT r8 task #2: the oracle-checked
    # connected-components twin takes the slot its rows-only sibling
    # wasted in r8; cosine top-k anchors the sim_ category)
    "dedup_components_exact",
    "sim_cosine_topk",
    # text + multimodal (never-verified tail + pure-numpy codecs + NEW
    # chunking; frame_sample holds for its second round)
    "text_token_stats",
    "text_top_bigrams",
    "text_bigram_novelty",
    "text_chunk_overlap",
    "multimodal_frame_sample",
    "multimodal_png_decode",
    "multimodal_jpeg_roundtrip",
    # training-data ops (never-verified temperature mixing; NEW histogram
    # profile; train-prep composite holds for its second round)
    "train_mix_temperature",
    "train_numeric_profile",
    "pipeline_train_prep",
    # structured streaming (r8 first-timers hold; never-verified dedup
    # count + rollup maintenance rotate in)
    "stream_lh_sink_hourly",
    "stream_lh_source_by_type",
    "stream_lh_datasource_partitioned",
    "stream_user_running_totals",
    "stream_sliding_2h",
    "stream_dedup_count",
    "stream_lh_rollup_maintain",
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
