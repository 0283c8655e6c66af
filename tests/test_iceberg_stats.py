"""Iceberg metadata-time stats + transform pruning and the r17 ADVICE
fixes (lakehouse/iceberg_interop.py): manifest lower/upper bounds,
bucket/truncate partition transforms pushed through predicates,
empty-after-prune as a typed empty DataFrame, current-schema-id
resolution, and URI-encoded-path joins (spaces / literal '%' in file
paths must not resurrect deleted rows)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import iceberg_interop as I
from pyiceberg_lakehouse_spark.lakehouse.iceberg_transforms import (
    apply_transform,
    serialize_single_value,
)
from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir

SCHEMA_FIELDS = [
    {"id": 1, "name": "id", "required": True, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "long"},
    {"id": 3, "name": "s", "required": False, "type": "string"},
]


def _one_parquet(d):
    return next(os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet"))


def _write_range_file(spark, td, name, lo, hi):
    d = os.path.join(td, name)
    (
        spark.range(lo, hi)
        .withColumn("v", F.col("id") * 2)
        .withColumn("s", F.concat(F.lit("s"), (F.col("id") % 7)))
        .coalesce(1)
        .write.parquet(d)
    )
    return _one_parquet(d)


@pytest.fixture
def bounded_table(spark):
    """Three range files with manifest bounds on id (field 1)."""
    td = session_tmpdir(prefix="ice_stats_")
    files = []
    for i, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 300)]):
        p = _write_range_file(spark, td, f"f{i}", lo, hi)
        files.append({
            "path": p, "records": hi - lo,
            "lower_bounds": {1: serialize_single_value(lo, "long")},
            "upper_bounds": {1: serialize_single_value(hi - 1, "long")},
        })
    mp = I.write_iceberg_metadata(
        td, snapshots=[{"files": files}], schema_fields=SCHEMA_FIELDS
    )
    return mp


class TestBoundsPruning:
    def test_le_prunes_upper_files(self, spark, bounded_table):
        plan = I.plan_iceberg_scan(
            bounded_table, predicates=[("id", "<=", 150)]
        )
        assert plan["n_candidates"] == 3
        assert plan["n_pruned"] == 1  # file [200, 300) provably out
        df = I.read_iceberg_table(
            spark, bounded_table, predicates=[("id", "<=", 150)]
        ).filter(F.col("id") <= 150)
        assert df.count() == 151

    def test_eq_keeps_one(self, bounded_table):
        plan = I.plan_iceberg_scan(
            bounded_table, predicates=[("id", "=", 250)]
        )
        assert plan["n_pruned"] == 2
        assert len(plan["files"]) == 1

    def test_in_list(self, bounded_table):
        plan = I.plan_iceberg_scan(
            bounded_table, predicates=[("id", "in", [5, 250])]
        )
        assert plan["n_pruned"] == 1

    def test_gt_boundary_exact(self, bounded_table):
        # id > 199: files [0,100) and [100,200) provably out
        plan = I.plan_iceberg_scan(
            bounded_table, predicates=[("id", ">", 199)]
        )
        assert plan["n_pruned"] == 2
        # id >= 199 keeps the [100,200) file too
        plan = I.plan_iceberg_scan(
            bounded_table, predicates=[("id", ">=", 199)]
        )
        assert plan["n_pruned"] == 1

    def test_missing_bounds_conservative(self, spark):
        td = session_tmpdir(prefix="ice_nob_")
        p = _write_range_file(spark, td, "f0", 0, 10)
        mp = I.write_iceberg_metadata(
            td, snapshots=[{"files": [{"path": p, "records": 10}]}],
            schema_fields=SCHEMA_FIELDS,
        )
        plan = I.plan_iceberg_scan(mp, predicates=[("id", "=", 999)])
        assert plan["n_pruned"] == 0  # no stats: must keep

    def test_empty_after_prune_is_typed_empty_frame(
        self, spark, bounded_table
    ):
        df = I.read_iceberg_table(
            spark, bounded_table, predicates=[("id", ">", 10_000)]
        )
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["id", "v", "s"]
        assert df.schema["id"].dataType.simpleString() == "bigint"
        assert df.schema["s"].dataType.simpleString() == "string"

    def test_unknown_predicate_column_raises(self, bounded_table):
        with pytest.raises(ValueError, match="not in the table schema"):
            I.plan_iceberg_scan(
                bounded_table, predicates=[("nope", "=", 1)]
            )


@pytest.mark.slow
class TestTransformPruning:
    def _bucket_table(self, spark, n_buckets=4):
        td = session_tmpdir(prefix="ice_bkt_")
        files = []
        for b in range(n_buckets):
            d = os.path.join(td, f"b{b}")
            rows = [
                (i, i * 2, "x") for i in range(400)
                if apply_transform(f"bucket[{n_buckets}]", i, "long") == b
            ]
            spark.createDataFrame(
                rows, "id long, v long, s string"
            ).coalesce(1).write.parquet(d)
            files.append({
                "path": _one_parquet(d),
                "records": len(rows),
                "partition": {"id_bucket": b},
            })
        mp = I.write_iceberg_metadata(
            td,
            snapshots=[{"files": files}],
            schema_fields=SCHEMA_FIELDS,
            partition_specs=[{
                "spec-id": 0,
                "fields": [{
                    "name": "id_bucket", "transform": f"bucket[{n_buckets}]",
                    "source-id": 1, "field-id": 1000,
                }],
            }],
            partition_fields=[("id_bucket", "int")],
        )
        return mp

    def test_bucket_equality_prunes(self, spark):
        mp = self._bucket_table(spark)
        want = apply_transform("bucket[4]", 42, "long")
        plan = I.plan_iceberg_scan(mp, predicates=[("id", "=", 42)])
        assert plan["n_pruned"] == 3
        assert plan["files"][0]["partition"]["id_bucket"] == want
        got = I.read_iceberg_table(
            spark, mp, predicates=[("id", "=", 42)]
        ).filter(F.col("id") == 42)
        assert got.count() == 1

    def test_bucket_range_keeps_everything(self, spark):
        mp = self._bucket_table(spark)
        plan = I.plan_iceberg_scan(mp, predicates=[("id", "<", 10)])
        assert plan["n_pruned"] == 0  # hash cannot serve ranges

    def test_truncate_string_prunes(self, spark):
        td = session_tmpdir(prefix="ice_trunc_")
        files = []
        for word in ("apple", "apricot", "banana"):
            d = os.path.join(td, word)
            spark.createDataFrame(
                [(1, 2, word)], "id long, v long, s string"
            ).coalesce(1).write.parquet(d)
            files.append({
                "path": _one_parquet(d), "records": 1,
                "partition": {"s_trunc": word[:2]},
            })
        mp = I.write_iceberg_metadata(
            td,
            snapshots=[{"files": files}],
            schema_fields=SCHEMA_FIELDS,
            partition_specs=[{
                "spec-id": 0,
                "fields": [{
                    "name": "s_trunc", "transform": "truncate[2]",
                    "source-id": 3, "field-id": 1000,
                }],
            }],
            partition_fields=[("s_trunc", "string")],
        )
        plan = I.plan_iceberg_scan(mp, predicates=[("s", "=", "banana")])
        assert plan["n_pruned"] == 2
        plan = I.plan_iceberg_scan(mp, predicates=[("s", "=", "apple")])
        assert plan["n_pruned"] == 1  # apple + apricot share 'ap'


class TestSchemaResolution:
    def test_current_schema_id_selects_newest(self, spark):
        td = session_tmpdir(prefix="ice_schem_")
        p = _write_range_file(spark, td, "f0", 0, 10)
        mp = I.write_iceberg_metadata(
            td, snapshots=[{"files": [{"path": p, "records": 10}]}],
            schema_fields=SCHEMA_FIELDS,
        )
        meta = json.load(open(mp))
        renamed = [
            {**f, "name": ("id_renamed" if f["name"] == "id" else f["name"])}
            for f in SCHEMA_FIELDS
        ]
        meta["schemas"] = [
            {"type": "struct", "schema-id": 0, "fields": SCHEMA_FIELDS},
            {"type": "struct", "schema-id": 7, "fields": renamed},
        ]
        meta["current-schema-id"] = 7
        json.dump(meta, open(mp, "w"))
        info = I.iceberg_live_files(mp)
        names = [f["name"] for f in info["schema_fields"]]
        assert "id_renamed" in names and "id" not in names


class TestEncodedPaths:
    def test_space_and_percent_in_path_deletes_still_apply(self, spark):
        """Spark reports _metadata.file_path URI-encoded (%20 for a
        space, %25 for a literal '%'); the manifests record raw
        strings. The decoded join must line up — a mismatch would NULL
        __ice_seq and silently resurrect deleted rows (r16 ADVICE)."""
        td = session_tmpdir(prefix="ice_uri_")
        sub = os.path.join(td, "with space", "odd%20dir")
        os.makedirs(sub, exist_ok=True)
        d1 = os.path.join(sub, "f1")
        spark.range(0, 100).withColumn("v", F.col("id") * 2) \
            .withColumn("s", F.lit("x")).coalesce(1).write.parquet(d1)
        f1 = _one_parquet(d1)
        # position-delete ids 0..9 (rows written in id order, one file)
        pd_dir = os.path.join(td, "pd")
        spark.createDataFrame(
            [(os.path.abspath(f1), i) for i in range(10)],
            "file_path string, pos long",
        ).coalesce(1).write.parquet(pd_dir)
        pd = _one_parquet(pd_dir)
        mp = I.write_iceberg_metadata(
            td,
            snapshots=[
                {"files": [{"path": f1, "records": 100}]},
                {"pos_deletes": [{"path": pd, "records": 10}]},
            ],
            schema_fields=SCHEMA_FIELDS,
        )
        df = I.read_iceberg_table(spark, mp)
        assert df.count() == 90
        assert df.agg(F.min("id")).collect()[0][0] == 10


@pytest.mark.slow
class TestNullCountPruning:
    def _table(self, spark):
        td = session_tmpdir(prefix="ice_nulls_")
        files = []
        plans = [
            ("allnull", [(1, 2, None), (3, 4, None)], 2, 2),
            ("mixed", [(5, 6, "x"), (7, 8, None)], 2, 1),
            ("nonull", [(9, 10, "y"), (11, 12, "z")], 2, 0),
        ]
        for name, rows, vals, nulls in plans:
            d = os.path.join(td, name)
            spark.createDataFrame(
                rows, "id long, v long, s string"
            ).coalesce(1).write.parquet(d)
            files.append({
                "path": _one_parquet(d), "records": len(rows),
                "value_counts": {3: vals},
                "null_value_counts": {3: nulls},
            })
        return I.write_iceberg_metadata(
            td, snapshots=[{"files": files}], schema_fields=SCHEMA_FIELDS
        )

    def test_is_null_prunes_null_free_files(self, spark):
        mp = self._table(spark)
        plan = I.plan_iceberg_scan(mp, predicates=[("s", "is null", None)])
        assert plan["n_pruned"] == 1  # the no-null file
        df = I.read_iceberg_table(
            spark, mp, predicates=[("s", "is null", None)]
        ).filter(F.col("s").isNull())
        assert df.count() == 3

    def test_is_not_null_prunes_all_null_files(self, spark):
        mp = self._table(spark)
        plan = I.plan_iceberg_scan(
            mp, predicates=[("s", "is not null", None)]
        )
        assert plan["n_pruned"] == 1  # the all-null file
        df = I.read_iceberg_table(
            spark, mp, predicates=[("s", "is not null", None)]
        ).filter(F.col("s").isNotNull())
        assert df.count() == 3

    def test_missing_counts_keep(self, spark):
        td = session_tmpdir(prefix="ice_nullsx_")
        p = _write_range_file(spark, td, "f0", 0, 5)
        mp = I.write_iceberg_metadata(
            td, snapshots=[{"files": [{"path": p, "records": 5}]}],
            schema_fields=SCHEMA_FIELDS,
        )
        for op in ("is null", "is not null"):
            assert I.plan_iceberg_scan(
                mp, predicates=[("s", op, None)]
            )["n_pruned"] == 0


class TestRefTimeTravel:
    def test_tag_and_branch_refs(self, spark):
        td = session_tmpdir(prefix="ice_refs_")
        f1 = _write_range_file(spark, td, "f1", 0, 10)
        f2 = _write_range_file(spark, td, "f2", 10, 30)
        mp = I.write_iceberg_metadata(
            td,
            snapshots=[
                {"files": [{"path": f1, "records": 10}]},
                {"files": [{"path": f2, "records": 20}]},
            ],
            schema_fields=SCHEMA_FIELDS,
            extra_refs={
                "v1.0": {"snapshot-id": 1000, "type": "tag"},
                "audit": {"snapshot-id": 1001, "type": "branch"},
            },
        )
        assert I.read_iceberg_table(spark, mp, ref="v1.0").count() == 10
        assert I.read_iceberg_table(spark, mp, ref="audit").count() == 30
        assert I.read_iceberg_table(spark, mp, ref="main").count() == 30
        with pytest.raises(KeyError, match="nope"):
            I.read_iceberg_table(spark, mp, ref="nope")
        # explicit snapshot_id wins over ref resolution entirely
        assert I.iceberg_live_files(mp, snapshot_id=1000, ref="audit")[
            "snapshot_id"
        ] == 1000


class TestConservativeKeepOnUnsupported:
    """r18 ADVICE pin: a KNOWN transform over a source type the planner
    cannot hash (foreign-written spec) keeps the file — planning is an
    optimization; the in-query filter owns correctness."""

    def test_bucket_over_boolean_source_keeps_file(self, spark):
        td = session_tmpdir(prefix="ice_conskeep_")
        d = os.path.join(td, "f0")
        spark.createDataFrame(
            [(True, 1), (False, 2)], "flag boolean, v long"
        ).coalesce(1).write.parquet(d)
        fields = [
            {"id": 1, "name": "flag", "required": False,
             "type": "boolean"},
            {"id": 2, "name": "v", "required": False, "type": "long"},
        ]
        mp = I.write_iceberg_metadata(
            td,
            snapshots=[{"files": [{
                "path": _one_parquet(d), "records": 2,
                "partition": {"flag_bucket": 0},
            }]}],
            schema_fields=fields,
            partition_specs=[{
                "spec-id": 0,
                "fields": [{
                    "name": "flag_bucket", "transform": "bucket[4]",
                    "source-id": 1, "field-id": 1000,
                }],
            }],
            partition_fields=[("flag_bucket", "int")],
        )
        # bucket_hash(boolean) is unsupported: the planner must keep
        # the file, not crash mid-planning
        plan = I.plan_iceberg_scan(mp, predicates=[("flag", "=", True)])
        assert plan["n_pruned"] == 0
        assert len(plan["files"]) == 1
        # and the read still yields the right rows with the same
        # predicate applied in-query
        df = I.read_iceberg_table(
            spark, mp, predicates=[("flag", "=", True)]
        ).filter(F.col("flag") == True)  # noqa: E712
        assert [r.v for r in df.collect()] == [1]


class TestMorDeleteJoinStrategy:
    """r18 (VERDICT r17 task #4): the MoR delete anti-join strategy
    gate. Small delete sets broadcast; above BROADCAST_DELETE_ROWS
    the anti-join must take a shuffle strategy — and produce the SAME
    result."""

    def _mor_table(self, spark):
        td = session_tmpdir(prefix="ice_mor_thresh_")
        d = os.path.join(td, "data0")
        spark.range(0, 1000).withColumn(
            "v", F.col("id") * 2
        ).coalesce(1).write.parquet(d)
        data_p = _one_parquet(d)
        dd = os.path.join(td, "del0")
        uri = "file://" + os.path.abspath(data_p)
        spark.createDataFrame(
            [(uri, int(i)) for i in range(0, 1000, 10)],
            "file_path string, pos long",
        ).coalesce(1).write.parquet(dd)
        fields = [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "long"},
        ]
        mp = I.write_iceberg_metadata(
            td,
            snapshots=[
                {"files": [{"path": data_p, "records": 1000}]},
                {"files": [],
                 "pos_deletes": [{"path": _one_parquet(dd),
                                  "records": 100}]},
            ],
            schema_fields=fields,
        )
        return mp

    def _delete_join_is_broadcast(self, df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the delete anti-join is the LeftAnti join node
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti, plan
        return all("Broadcast" in ln for ln in anti)

    def test_small_set_broadcasts_large_set_shuffles(
        self, spark, monkeypatch
    ):
        """Differential pin with auto-broadcast OFF: under the
        threshold our explicit hint drives a broadcast anti-join;
        above it no hint is planted, so the join falls back to
        Spark's shuffle strategy (at real scale Catalyst's own size
        stats make the same call — the hint is what must NOT force a
        multi-GB delete set onto the driver)."""
        mp = self._mor_table(spark)
        want = {(i, 2 * i) for i in range(1000) if i % 10 != 0}
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df_b = I.read_iceberg_table(spark, mp)
            assert self._delete_join_is_broadcast(df_b), \
                "under-threshold delete set must broadcast via the hint"
            assert {(r.id, r.v) for r in df_b.collect()} == want

            monkeypatch.setattr(I, "BROADCAST_DELETE_ROWS", 10)
            df_s = I.read_iceberg_table(spark, mp)
            assert not self._delete_join_is_broadcast(df_s), \
                "above-threshold delete set must not be hint-broadcast"
            assert {(r.id, r.v) for r in df_s.collect()} == want
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", thresh
            )


class TestV3DeletionVectors:
    """r18: Iceberg v3 deletion vectors — Puffin-framed roaring
    bitmaps applied through the MoR anti-join, decoded executor-side."""

    def _v3_table(self, spark, dv_positions):
        td = session_tmpdir(prefix="ice_v3_")
        from pyiceberg_lakehouse_spark.lakehouse.puffin import (
            write_deletion_vector_file,
        )

        d1 = os.path.join(td, "f1")
        spark.range(0, 1000).withColumn(
            "v", F.col("id") * 2
        ).coalesce(1).write.parquet(d1)
        p1 = _one_parquet(d1)
        pf = os.path.join(td, "dv.puffin")
        entries = write_deletion_vector_file(
            pf, [{"data_file": p1, "positions": dv_positions}],
            snapshot_id=1001, sequence_number=2,
        )
        fields = [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "long"},
        ]
        mp = I.write_iceberg_metadata(
            td,
            snapshots=[
                {"files": [{"path": p1, "records": 1000}]},
                {"files": [], "dv_deletes": [
                    {"path": pf, **e} for e in entries
                ]},
            ],
            schema_fields=fields,
            format_version=3,
        )
        return mp, p1, pf

    def test_dv_applies_and_time_travel(self, spark):
        mp, _p1, _pf = self._v3_table(spark, list(range(0, 1000, 7)))
        got = sorted(r.id for r in I.read_iceberg_table(
            spark, mp).collect())
        assert got == [i for i in range(1000) if i % 7 != 0]
        # pre-DV snapshot sees everything
        assert I.read_iceberg_table(
            spark, mp, snapshot_id=1000).count() == 1000
        # metadata declares v3
        assert json.load(open(mp))["format-version"] == 3

    def test_one_dv_per_file_invariant(self, spark):
        mp, p1, pf = self._v3_table(spark, [1, 2])
        from pyiceberg_lakehouse_spark.lakehouse.puffin import (
            write_deletion_vector_file,
        )

        td = os.path.dirname(pf)
        pf2 = os.path.join(td, "dv2.puffin")
        e2 = write_deletion_vector_file(
            pf2, [{"data_file": p1, "positions": [3]}])
        fields = json.load(open(mp))["schemas"][0]["fields"]
        mp2 = I.write_iceberg_metadata(
            os.path.join(td, "dup"),
            snapshots=[
                {"files": [{"path": p1, "records": 1000}]},
                {"files": [], "dv_deletes": (
                    [{"path": pf, "referenced_data_file": p1,
                      "content_offset": 4,
                      "content_size_in_bytes": os.path.getsize(pf) - 100,
                      "records": 2}]
                    + [{"path": pf2, **e2[0]}]
                )},
            ],
            schema_fields=fields,
            format_version=3,
        )
        with pytest.raises(ValueError, match="multiple deletion"):
            I.read_iceberg_table(spark, mp2).collect()

    def test_dv_needs_v3(self, spark):
        td = session_tmpdir(prefix="ice_v3gate_")
        with pytest.raises(ValueError, match="format_version=3"):
            I.write_iceberg_metadata(
                td,
                snapshots=[{"files": [], "dv_deletes": [
                    {"path": "x", "referenced_data_file": "y",
                     "content_offset": 0, "content_size_in_bytes": 1,
                     "records": 1},
                ]}],
                schema_fields=[{"id": 1, "name": "id",
                                "required": False, "type": "long"}],
            )

    def test_dv_manifest_fields_have_spec_ids(self, spark):
        from pyiceberg_lakehouse_spark.operators.avro import decode_avro

        mp, _p1, _pf = self._v3_table(spark, [5])
        meta = json.load(open(mp))
        head = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"])
        mlist = decode_avro(open(head["manifest-list"], "rb").read())
        del_entry = next(e for e in mlist["records"]
                         if e["content"] == 1)
        man = decode_avro(open(del_entry["manifest_path"], "rb").read())
        df_ids = {
            f["name"]: f.get("field-id")
            for f in next(
                f for f in man["schema"]["fields"]
                if f["name"] == "data_file"
            )["type"]["fields"]
        }
        assert df_ids["referenced_data_file"] == 143
        assert df_ids["content_offset"] == 144
        assert df_ids["content_size_in_bytes"] == 145
        rec = next(e for e in man["records"]
                   if e["data_file"]["content"] == 1)["data_file"]
        assert rec["file_format"] == "PUFFIN"
        assert rec["referenced_data_file"].endswith(".parquet")


class TestNestedPredicates:
    """r18: struct-member predicates prune by the NESTED field's own
    id (Iceberg manifests key bounds/counts by nested field ids)."""

    def _nested_table(self, spark):
        td = session_tmpdir(prefix="ice_nested_")
        files = []
        for i, (lo, hi) in enumerate([(0, 100), (100, 200)]):
            d = os.path.join(td, f"f{i}")
            (
                spark.range(lo, hi)
                .select(
                    F.col("id"),
                    F.struct(
                        (F.col("id") * 10).alias("zip"),
                        F.lit("x").alias("city"),
                    ).alias("addr"),
                )
                .coalesce(1).write.parquet(d)
            )
            files.append({
                "path": _one_parquet(d), "records": hi - lo,
                "lower_bounds": {
                    3: serialize_single_value(lo * 10, "long")},
                "upper_bounds": {
                    3: serialize_single_value((hi - 1) * 10, "long")},
                "null_value_counts": {3: 0},
                "value_counts": {3: hi - lo},
            })
        fields = [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "addr", "required": False, "type": {
                "type": "struct", "fields": [
                    {"id": 3, "name": "zip", "required": False,
                     "type": "long"},
                    {"id": 4, "name": "city", "required": False,
                     "type": "string"},
                ],
            }},
        ]
        return I.write_iceberg_metadata(
            td, snapshots=[{"files": files}], schema_fields=fields
        )

    def test_struct_member_bounds_prune(self, spark):
        mp = self._nested_table(spark)
        plan = I.plan_iceberg_scan(
            mp, predicates=[("addr.zip", "<", 500)]
        )
        assert plan["n_candidates"] == 2
        assert plan["n_pruned"] == 1
        got = (
            I.read_iceberg_table(
                spark, mp, predicates=[("addr.zip", "<", 500)]
            )
            .filter(F.col("addr.zip") < 500)
        )
        assert got.count() == 50
        # IS NULL prunes on the nested field's null counts
        plan2 = I.plan_iceberg_scan(
            mp, predicates=[("addr.zip", "is null", None)]
        )
        assert plan2["n_pruned"] == 2

    def test_typed_empty_frame_with_struct(self, spark):
        mp = self._nested_table(spark)
        df = I.read_iceberg_table(
            spark, mp, predicates=[("addr.zip", ">", 10 ** 9)]
        )
        assert df.count() == 0
        assert df.schema["addr"].dataType.simpleString() == \
            "struct<zip:bigint,city:string>"

    def test_bad_paths_reject(self, spark):
        mp = self._nested_table(spark)
        with pytest.raises(ValueError, match="not in the table schema"):
            I.plan_iceberg_scan(mp, predicates=[("addr.nope", "=", 1)])
        with pytest.raises(ValueError, match="non-struct"):
            I.plan_iceberg_scan(mp, predicates=[("id.x", "=", 1)])
        # predicate on the struct itself (not a member) rejects
        with pytest.raises(NotImplementedError, match="struct"):
            I.plan_iceberg_scan(mp, predicates=[("addr", "=", 1)])


@pytest.mark.slow
class TestOrcDataFiles:
    """r18: mixed parquet+ORC data files (the migration reality).
    ORC scans through Spark's native reader; equality deletes apply
    (value+sequence semantics); ordinal-addressed deletes gate (no
    _metadata.row_index from the ORC reader)."""

    def _mixed(self, spark, with_eq=False, with_pos=False):
        td = session_tmpdir(prefix="ice_orc_")
        d1 = os.path.join(td, "pq")
        d2 = os.path.join(td, "orc")
        spark.range(0, 100).withColumn(
            "v", F.col("id") * 2).coalesce(1).write.parquet(d1)
        spark.range(100, 200).withColumn(
            "v", F.col("id") * 2).coalesce(1).write.orc(d2)
        import glob as _g

        p1 = _g.glob(d1 + "/*.parquet")[0]
        p2 = (_g.glob(d2 + "/*.orc") or _g.glob(d2 + "/part-*"))[0]
        fields = [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "long"},
        ]
        snaps = [{"files": [
            {"path": p1, "records": 100,
             "lower_bounds": {1: serialize_single_value(0, "long")},
             "upper_bounds": {1: serialize_single_value(99, "long")}},
            {"path": p2, "records": 100, "file_format": "ORC",
             "lower_bounds": {1: serialize_single_value(100, "long")},
             "upper_bounds": {1: serialize_single_value(199, "long")}},
        ]}]
        if with_eq:
            d3 = os.path.join(td, "eq")
            spark.createDataFrame(
                [(5,), (150,)], "id long"
            ).coalesce(1).write.parquet(d3)
            snaps.append({"files": [], "eq_deletes": [
                {"path": _g.glob(d3 + "/*.parquet")[0],
                 "records": 2, "equality_ids": [1]},
            ]})
        if with_pos:
            d4 = os.path.join(td, "pos")
            spark.createDataFrame(
                [("file://" + p2, 0)], "file_path string, pos long"
            ).coalesce(1).write.parquet(d4)
            snaps.append({"files": [], "pos_deletes": [
                {"path": _g.glob(d4 + "/*.parquet")[0], "records": 1},
            ]})
        return I.write_iceberg_metadata(
            td, snapshots=snaps, schema_fields=fields
        )

    def test_plain_mixed_scan_and_pruning(self, spark):
        mp = self._mixed(spark)
        df = I.read_iceberg_table(spark, mp)
        assert df.count() == 200
        # bounds prune works across formats
        plan = I.plan_iceberg_scan(mp, predicates=[("id", "<", 50)])
        assert plan["n_pruned"] == 1
        got = I.read_iceberg_table(
            spark, mp, predicates=[("id", ">=", 150)]
        ).filter(F.col("id") >= 150)
        assert got.count() == 50  # the pruned-to-ORC read works

    def test_equality_deletes_across_formats(self, spark):
        mp = self._mixed(spark, with_eq=True)
        got = sorted(
            r.id for r in I.read_iceberg_table(spark, mp).collect()
        )
        assert got == [i for i in range(200) if i not in (5, 150)]

    def test_ordinal_deletes_over_orc_gate(self, spark):
        mp = self._mixed(spark, with_pos=True)
        with pytest.raises(NotImplementedError, match="row_index"):
            I.read_iceberg_table(spark, mp).collect()
