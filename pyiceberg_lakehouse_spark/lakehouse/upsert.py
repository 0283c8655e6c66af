"""Keyed upsert (last-wins MERGE) — the reference's flagship composite (Q2).

Semantics of upsert.py:58-86 / upsert_parquet-lazy-polars.py:58-98:
``MERGE INTO t USING new ON keys WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED
THEN INSERT *``. The reference's "last wins" depends on pandas concat file
order (upsert.py:53); we make it deterministic with an explicit source
priority column ordered in a row_number window (SURVEY.md §7 hard-part 1).

Two physical strategies:

- ``upsert``: full-table merge + overwrite. One shuffle on the key. Fine for
  small tables; at 100 TB it rewrites everything.
- ``upsert_partitioned``: partition-scoped rewrite — only partitions whose
  keys appear in the new batch are read, merged, and replaced; everything
  else is untouched metadata. The partition list comes from the (small) new
  batch via distinct+collect, so the rewrite cost is proportional to the
  touched data, not the table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable


def merge_keep_last(
    current: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
    materialize_new: bool = True,
) -> DataFrame:
    """Deterministic last-wins merge of two frames on ``key_cols``.

    ``new`` rows outrank ``current`` rows; within the new side,
    ``order_col`` (descending) breaks ties if given. Output has
    ``current``'s column set.

    r19 (guide §2.3/§3): the old implementation shuffled current ∪ new
    through ONE row_number window, so the exchange carried the FULL
    table side — at 100 TB that hash-repartitions the table to apply a
    batch orders of magnitude smaller. The merge's decisions only need
    the NEW side's keys: reduce new to one row per key (the same window
    ordering, now over the small side only), anti-join current against
    those keys (broadcast-able — the table side is never shuffled), and
    union. Null-safe key equality keeps the old window's NULL-key
    grouping (a new NULL-key row still replaces current NULL-key rows).
    One observable change, documented: a current side holding DUPLICATE
    keys keeps them when their key is not in the batch — the old
    window's pick among untouched equals was an undocumented,
    nondeterministic dedup side effect (no order separated them), and
    every caller's table invariant is one row per key.
    """
    cols = current.columns
    order = [F.desc(order_col)] if order_col else [F.lit(1)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    new_one = (
        new.select(*cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if materialize_new:
        # the reduced batch feeds BOTH the anti-join keys and the union;
        # cut the lineage so its source is scanned once, not per branch
        # (checkpointing the small side only — never the table side).
        # Callers whose batch is already cached (apply_changes) pass
        # False: re-reading a cache hit is cheaper than materializing.
        new_one = new_one.localCheckpoint(eager=False)
    cur = current.select(*cols)
    new_keys = new_one.select(
        *[F.col(k).alias(f"_mk_{k}") for k in key_cols]
    )
    survivors = cur.join(
        new_keys,
        on=reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.col(f"_mk_{k}")) for k in key_cols],
        ),
        how="left_anti",
    )
    return survivors.unionByName(new_one)


def upsert(
    table: LakehouseTable,
    new: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
    materialize_new: bool = True,
):
    """Full merge-overwrite (matches upsert.py:58-86 exactly)."""
    merged = merge_keep_last(
        table.scan(), new, key_cols, order_col,
        materialize_new=materialize_new,
    )
    return table.overwrite(merged, summary={"op": "upsert", "keys": key_cols})


def upsert_partitioned(
    table: LakehouseTable,
    new: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
    touched: list[dict[str, str]] | None = None,
    materialize_new: bool = True,
):
    """Partition-scoped upsert: rewrite only partitions touched by ``new``.

    Requires the table to be partitioned. The distinct partition values of
    the new batch are collected driver-side (low cardinality by construction
    — identity partition columns, main-polars.py:113) and drive both the
    pruned scan and the replace commit. A caller that already knows the
    batch's partition values (``apply_changes`` collects them in its
    op-counting job) passes ``touched`` to skip the extra batch scan.
    """
    pfs = table.partition_fields
    if not pfs:
        raise ValueError("table is not partitioned; use upsert()")
    _guard_single_spec(table, [pf.name for pf in pfs])
    # derive partition values (identity or transform) of the new batch —
    # hidden partitioning keeps this transparent to the caller
    if touched is None:
        touched = _touched_partitions(table, new)
    merged, touched = _merged_for_upsert(
        table, new, key_cols, order_col, touched,
        materialize_new=materialize_new,
    )
    return table.replace_partitions(merged, touched)


def _merged_for_upsert(
    table: LakehouseTable,
    new: DataFrame,
    key_cols: list[str],
    order_col: str | None,
    touched: list[dict[str, str]],
    materialize_new: bool = True,
):
    """Build the replacement frame for a partition-scoped upsert.

    ONE pruned scan with a composite partition IN-list — plan size (and
    read-node count) is constant in the number of touched partitions; the
    exactness guard in ``upsert_partitioned`` (all live files carry all
    current partition keys) makes the conservative missing-key rule exact.
    """
    current = (
        table.scan(partition_filter_any=touched)
        if touched
        else table.scan().limit(0)
    )
    return (
        merge_keep_last(
            current, new, key_cols, order_col,
            materialize_new=materialize_new,
        ),
        touched,
    )


def apply_changes(
    table: LakehouseTable,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "_op",
    order_col: str | None = None,
):
    """CDC apply: merge a change stream ('upsert'/'delete' ops) into the
    table — the consumer side of ``read_incremental``.

    The batch first reduces to one final action per key (``order_col``
    descending breaks intra-batch ties, e.g. a change-log sequence number);
    surviving upserts merge via the partition-scoped rewrite when the table
    is partitioned, and deletes commit as merge-on-read equality deletes —
    no data rewrite for the delete half, which at 100 TB is the difference
    between a metadata commit and rewriting every touched partition.
    """
    from pyiceberg_lakehouse_spark.lakehouse.transforms import derived_column_typed

    w_order = [F.desc(order_col)] if order_col else []
    if w_order:
        w = Window.partitionBy(*key_cols).orderBy(*w_order)
        latest = (
            changes.withColumn("_cdc_rn", F.row_number().over(w))
            .filter(F.col("_cdc_rn") == 1)
            .drop("_cdc_rn")
        )
    else:
        latest = changes  # caller guarantees one action per key
    # one cached materialization of the reduced batch + ONE deciding job
    # for BOTH commits — not two isEmpty() jobs that each re-run the
    # key-reduction window (and would run it twice more in the merge
    # paths). r19: the same job also collects the upsert half's distinct
    # (derived) partition values, so the partition-scoped merge skips its
    # own full pass over the batch (_touched_partitions) — three batch
    # scans became one.
    pfs = table.partition_fields if table.log.partition_by else []
    schema = table.schema()
    part_src = latest
    for pf in pfs:
        if not pf.is_identity:
            part_src = part_src.withColumn(
                pf.name,
                derived_column_typed(pf, schema[pf.source].dataType.simpleString()),
            )
    pnames = [pf.name for pf in pfs]
    latest = latest.cache()
    try:
        agg_cols = [
            F.count(F.when(F.col(op_col) == "upsert", 1)).alias("ups"),
            F.count(F.when(F.col(op_col) == "delete", 1)).alias("dels"),
        ]
        if pnames:
            agg_cols.append(
                F.collect_set(
                    F.when(
                        F.col(op_col) == "upsert", F.struct(*pnames)
                    )
                ).alias("parts")
            )
        counts = part_src.agg(*agg_cols).collect()[0]
        ups = latest.filter(F.col(op_col) == "upsert").drop(op_col)
        if order_col:
            ups = ups.drop(order_col) if order_col not in table.schema().fieldNames() else ups
        dels = latest.filter(F.col(op_col) == "delete").select(*key_cols)
        snaps = []
        if counts["ups"]:
            if table.log.partition_by:
                touched = [
                    {p: str(r[p]) for p in pnames} for r in counts["parts"]
                ]
                snaps.append(
                    upsert_partitioned(
                        table, ups, key_cols, order_col=None,
                        touched=touched, materialize_new=False,
                    )
                )
            else:
                snaps.append(
                    upsert(
                        table, ups, key_cols, order_col=None,
                        materialize_new=False,
                    )
                )
        if counts["dels"]:
            snaps.append(table.delete_keys(dels, key_cols))
        return snaps
    finally:
        latest.unpersist()


def merge_into(
    table: LakehouseTable,
    source: DataFrame,
    on: list[str],
    *,
    matched_update: F.Column | bool = True,
    matched_delete: F.Column | bool = False,
    not_matched_insert: F.Column | bool = True,
):
    """Conditional MERGE (Delta/Iceberg ``MERGE INTO`` surface)::

        MERGE INTO table USING source ON <on>
        WHEN MATCHED AND <matched_delete>      THEN DELETE
        WHEN MATCHED AND <matched_update>      THEN UPDATE SET *
        WHEN NOT MATCHED AND <not_matched_insert> THEN INSERT *

    Clause order follows the SQL standard: DELETE is evaluated before
    UPDATE, so a matched row satisfying both conditions is deleted.
    Conditions are boolean Columns over the joined row — target columns by
    name, source columns as ``_src_<name>`` — or plain True/False to
    enable/disable a clause unconditionally. A condition that evaluates to
    NULL is not-satisfied (SQL MERGE semantics) and falls through to the
    next clause. ``source`` must carry the target's column set; one row per
    key (pre-reduce with ``merge_keep_last`` when batches can contain key
    duplicates).

    One full-outer shuffle join on the key + overwrite — fine for small
    and unpartitioned tables. On a partitioned table use
    ``merge_into_partitioned`` (same clause semantics, cost proportional
    to the touched partitions); for op-tagged change batches prefer
    ``apply_changes`` (metadata-only deletes).
    """
    cols = table.schema().fieldNames()
    changes = None
    if table.cdf_enabled:
        merged, changes = _merge_clauses(
            table.scan(), source, cols, on,
            matched_update, matched_delete, not_matched_insert,
            with_changes=True,
        )
    else:
        merged = _merge_clauses(
            table.scan(), source, cols, on,
            matched_update, matched_delete, not_matched_insert,
        )
    return table.overwrite(
        merged, summary={"op": "merge_into", "keys": list(on)},
        change_rows=changes,
    )


def merge_into_partitioned(
    table: LakehouseTable,
    source: DataFrame,
    on: list[str],
    *,
    matched_update: F.Column | bool = True,
    matched_delete: F.Column | bool = False,
    not_matched_insert: F.Column | bool = True,
):
    """Partition-scoped conditional MERGE: identical clause semantics to
    ``merge_into`` but only partitions touched by the source batch are
    read, merged, and replaced — everything else is untouched metadata, so
    the cost is proportional to the touched data, not the table (the
    difference between a partition swap and rewriting 100 TB).

    The touched-partition list comes from the source batch's (derived)
    partition values, exactly like ``upsert_partitioned`` — and it shares
    that function's contract: a key's partition value must be stable (the
    MATCHED target row lives in the same partition as its source row), the
    usual property of identity/time-bucket partitioning where the
    partition column is immutable per key. Keys outside the touched
    partitions are untouched BY CONSTRUCTION, which is also what makes the
    NOT-MATCHED test exact: a source row's key can only match inside its
    own partition.
    """
    pfs = table.partition_fields
    if not pfs:
        raise ValueError("table is not partitioned; use merge_into()")
    _guard_single_spec(table, [pf.name for pf in pfs])
    cols = table.schema().fieldNames()
    touched = _touched_partitions(table, source.select(*cols))
    cur = (
        table.scan(partition_filter_any=touched)
        if touched
        else table.scan().limit(0)
    )
    changes = None
    if table.cdf_enabled:
        merged, changes = _merge_clauses(
            cur, source, cols, on,
            matched_update, matched_delete, not_matched_insert,
            with_changes=True,
        )
    else:
        merged = _merge_clauses(
            cur, source, cols, on,
            matched_update, matched_delete, not_matched_insert,
        )
    return table.replace_partitions(merged, touched, change_rows=changes)


def _guard_single_spec(table: LakehouseTable, names: list[str]) -> None:
    """Partition-scoped rewrites remove files by exact partition match;
    files written under an older spec don't carry the current keys and
    would merge without being replaced -> duplicates. Refuse loudly."""
    if any(
        any(n not in (f.get("partition") or {}) for n in names)
        for f in table.log.live_files()
    ):
        raise ValueError(
            "live files span partition specs (after evolution); "
            "compact() to the current spec first or use the full-table op"
        )


def _touched_partitions(
    table: LakehouseTable, batch: DataFrame
) -> list[dict[str, str]]:
    """Distinct (derived) partition values of ``batch`` — low cardinality
    by construction (identity/transform partition columns), collected
    driver-side to drive both the pruned scan and the replace commit."""
    from pyiceberg_lakehouse_spark.lakehouse.transforms import derived_column_typed

    pfs = table.partition_fields
    schema = table.schema()
    tagged = batch
    for pf in pfs:
        if not pf.is_identity:
            tagged = tagged.withColumn(
                pf.name,
                derived_column_typed(pf, schema[pf.source].dataType.simpleString()),
            )
    names = [pf.name for pf in pfs]
    return [
        {p: str(r[p]) for p in names}
        for r in tagged.select(*names).distinct().collect()
    ]


def _merge_clauses(
    cur: DataFrame,
    source: DataFrame,
    cols: list[str],
    on: list[str],
    matched_update: F.Column | bool,
    matched_delete: F.Column | bool,
    not_matched_insert: F.Column | bool,
    with_changes: bool = False,
):
    """The MERGE INTO row-disposition frame shared by the full-table and
    partition-scoped variants: full-outer join target vs source on the
    key, then apply DELETE > UPDATE > INSERT clause precedence.
    ``with_changes=True`` additionally returns the merge's row-level delta
    (``_change_type``-tagged) for change-data-feed commits."""
    src = source.select(*cols)
    src_named = src.select(
        *[F.col(c).alias(f"_src_{c}") for c in cols]
    ).withColumn("_src_present", F.lit(True))
    joined = cur.withColumn("_tgt_present", F.lit(True)).join(
        src_named,
        on=[F.col(k).eqNullSafe(F.col(f"_src_{k}")) for k in on],
        how="full_outer",
    )

    def _cond(c: F.Column | bool) -> F.Column:
        # SQL MERGE treats a NULL clause condition as not-satisfied (falls
        # through to the next clause); without the coalesce, a NULL column in
        # the condition would NULL delete_hit/update_hit/keep_target and the
        # row-disposition filter would silently DROP the row — data loss.
        return F.lit(c) if isinstance(c, bool) else F.coalesce(c, F.lit(False))

    matched = F.col("_tgt_present").isNotNull() & F.col("_src_present").isNotNull()
    delete_hit = matched & _cond(matched_delete)
    update_hit = matched & ~_cond(matched_delete) & _cond(matched_update)
    insert_hit = (
        F.col("_tgt_present").isNull()
        & F.col("_src_present").isNotNull()
        & _cond(not_matched_insert)
    )
    keep_target = F.col("_tgt_present").isNotNull() & ~delete_hit & ~update_hit
    out_cols = [
        F.when(update_hit | insert_hit, F.col(f"_src_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in cols
    ]
    out = joined.filter(keep_target | update_hit | insert_hit).select(*out_cols)
    if not with_changes:
        return out
    # Row-level delta of the merge for the change-data feed: DELETEd rows
    # and changed-UPDATE pre-images tag 'delete'; INSERTs and changed-UPDATE
    # post-images tag 'insert'. An UPDATE that assigns identical values
    # emits nothing, so the feed equals the state diff exactly. Both
    # branches re-filter the same join; each is scoped to the frame the
    # caller already pruned (touched partitions for the partitioned merge).
    same = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_src_{c}")) for c in cols],
    )
    eff_update = update_hit & ~same
    pre = (
        joined.filter(delete_hit | eff_update)
        .select(*cols)
        .withColumn("_change_type", F.lit("delete"))
    )
    post = (
        joined.filter(insert_hit | eff_update)
        .select(*[F.col(f"_src_{c}").alias(c) for c in cols])
        .withColumn("_change_type", F.lit("insert"))
    )
    return out, pre.unionByName(post)
