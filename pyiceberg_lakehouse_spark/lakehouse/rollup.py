"""Incrementally-maintained aggregate rollups over lakehouse tables.

The timeseries-DB "continuous aggregate" / hypertable-rollup pattern on
snapshot-log metadata: a rollup is a SMALL summary table (one row per
dimension combination) whose state is advanced from the source table's
snapshot DIFF, not recomputed from the full fact table. At 100 TB the
economics are the whole point — a daily summary refresh reads the appended
files only (``read_incremental`` plans them from metadata), aggregates the
delta, and merges it with the existing summary by a groupBy over summary
rows; the fact table is never rescanned.

Only incrementally MERGEABLE state is stored. sum/count/min/max store
their own value; avg and stddev are DECOMPOSED into mergeable parts —
non-null sum (``psum_<col>``), sum of squares (``psumsq_<col>``), and
non-null count (``pcnt_<col>``) — and the final column is derived at read
time by :func:`read_rollup` (avg = psum/pcnt; sample stddev =
sqrt((psumsq - psum²/pcnt)/(pcnt-1))). Percentiles (``p50``/``p95``/...)
store an EXACT dense value-count histogram over a bounded integer domain
declared at create time (``domains={"col": (lo, hi)}``): counts merge by
element-wise addition, and the read path derives the SQL-standard
``percentile_disc`` answer (smallest value whose cumulative count reaches
ceil(q*n)) with pure integer arithmetic — bit-identical to a from-scratch
sort-based percentile, no sketch error. Values outside the declared
domain (or non-integral values) land in sentinel under/overflow slots and
make the derived percentile NULL rather than silently wrong. Heavy hitters
(``top1``/``top5``/...) store the full value->count map per group under a
declared distinct-cardinality cap (``freq_caps={"col": n}``, default
10,000): maps merge by key-union addition — exact, no sketch error — and
collapse to a sticky overflow sentinel (derived topN reads NULL) the
moment a group exceeds the cap. Merge rules:
partial sums/counts/squares/histograms add; partial mins/maxes fold with
least/greatest; frequency maps union-add. History that is
not an append-only delta (overwrite / replace / delete snapshots, or an
expired refresh cursor) cannot be merged incrementally; ``refresh_rollup``
detects that from the log and falls back to a FULL recompute, recording
which mode ran in the commit summary — correctness never depends on the
fast path applying.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable

# requested aggregate surface; avg/stddev are stored as decomposed parts,
# distinct as a mergeable HLL register vector, pNN percentiles as an exact
# dense histogram over a declared bounded integer domain
_SUPPORTED = (
    "sum", "count", "min", "max", "avg", "stddev", "distinct",
    "p1..p99", "top1..top99",
)

_PCT_RE = re.compile(r"^p([1-9][0-9]?)$")


def _pct_of(fn: str) -> int | None:
    m = _PCT_RE.match(fn)
    return int(m.group(1)) if m else None

# ---------------------------------------------------------------- HLL ----
# HyperLogLog parameters. The hash is the engine-portable 60-bit md5 trick
# used across the corpus (Spark conv(substr(md5(x),1,15),16,10) == DuckDB
# ('0x'||substr(md5(x),1,15))::bigint), split into a register index (low
# p bits) and a rank field (next HLL_RANK_BITS bits). Register values are
# therefore in [1, HLL_RANK_BITS+1] and the scaled indicator sum
# sum(2^(RANK_BITS+1 - r)) over all m registers is an EXACT bigint
# (max m * 2^24 = 2^34) — every piece of HLL state is integer-exact and
# bit-reproducible by a SQL oracle, no float accumulation anywhere.
HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers -> ~1.04/sqrt(m) = 3.25% std error
HLL_RANK_BITS = 23
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_zero() -> F.Column:
    return F.array_repeat(F.lit(0), HLL_M)


def _hll_rank(w: F.Column) -> F.Column:
    """rank = (RANK_BITS+1) - bitlength(w) via an integer-compare chain —
    portable (the oracle uses the same CASE chain), no float log2."""
    c = F.when(w >= F.lit(1 << (HLL_RANK_BITS - 1)), F.lit(1))
    for b in range(HLL_RANK_BITS - 2, -1, -1):
        c = c.when(w >= F.lit(1 << b), F.lit(HLL_RANK_BITS - b))
    return c.otherwise(F.lit(HLL_RANK_BITS + 1))  # w == 0


def _hll_delta(
    df: DataFrame, dim_names: list[str], col: str, name: str
) -> DataFrame:
    """Per-dims dense HLL register vector for ``col`` over raw fact rows.

    Two partial-combining shuffles: (dims, idx) -> max rank reduces each
    group to <= m rows MAP-SIDE before the exchange (a hot group never
    ships its raw rows), then dims -> dense array over the tiny sparse
    set. NULL values contribute nothing, matching COUNT(DISTINCT)."""
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    idx = h.bitwiseAND(F.lit(HLL_M - 1)).cast("int")
    w = F.shiftright(h, HLL_P).bitwiseAND(F.lit((1 << HLL_RANK_BITS) - 1))
    sparse = (
        df.filter(F.col(col).isNotNull())
        .select(*dim_names, idx.alias("_hll_idx"), _hll_rank(w).alias("_hll_rank"))
        .groupBy(*dim_names, "_hll_idx")
        .agg(F.max("_hll_rank").alias("_hll_rank"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(HLL_M - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_hll_map"), i), F.lit(0)),
    )
    return (
        sparse.groupBy(*dim_names)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_hll_idx", "_hll_rank"))
            ).alias("_hll_map")
        )
        .select(*dim_names, dense.cast("array<int>").alias(name))
    )


def _hll_merge_expr(name: str) -> F.Column:
    """Element-wise max of register vectors across a group's partial rows
    (collect_list is bounded by the number of PARTIALS per dim combo —
    at refresh time that's 2: old state + delta)."""
    return (
        F.aggregate(
            F.collect_list(name),
            _hll_zero(),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: F.greatest(a, b)),
        )
        .cast("array<int>")  # containsNull=true, matching the read schema
        .alias(name)
    )


def hll_scaled_sum(name: str) -> F.Column:
    """sum(2^-r) over the registers, scaled by 2^(RANK_BITS+1) — an EXACT
    bigint (the HLL indicator in integer form; empty registers contribute
    2^(RANK_BITS+1))."""
    # 2^(RANK_BITS+1 - r) via pow: exact for these exponents (<= 2^24 fits
    # a double mantissa); shiftleft would be natural but takes only a
    # literal shift amount
    return F.aggregate(
        F.col(name),
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.pow(F.lit(2.0), F.lit(HLL_RANK_BITS + 1) - r).cast("long"),
    )


def hll_zero_count(name: str) -> F.Column:
    """Number of empty registers (the linear-counting input)."""
    return F.size(F.filter(F.col(name), lambda r: r == F.lit(0)))


def hll_estimate(name: str) -> F.Column:
    """HLL cardinality estimate with the standard small-range (linear
    counting) correction."""
    s = hll_scaled_sum(name).cast("double") / F.lit(
        float(1 << (HLL_RANK_BITS + 1))
    )
    raw = F.lit(_HLL_ALPHA * HLL_M * HLL_M) / s
    v = hll_zero_count(name)
    return F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)


# ---------------------------------------------------- exact histogram ----
# Percentile state: a dense bigint count vector over the declared integer
# domain [lo, hi], with slot 0 = underflow and slot len-1 = overflow (the
# numeric_profile sentinel convention); value v maps to slot v-lo+1. Counts
# are integers, merges are element-wise adds, so every refresh/reaggregate
# is EXACT — the derived percentile is the SQL-standard percentile_disc
# answer, not a sketch estimate.


def _hist_len(lo: int, hi: int) -> int:
    return hi - lo + 3


def _hist_delta(
    df: DataFrame, dim_names: list[str], col: str, name: str, lo: int, hi: int
) -> DataFrame:
    """Per-dims dense count histogram for ``col`` over raw fact rows.

    Same two-shuffle shape as :func:`_hll_delta`: (dims, slot) -> count
    partial-combines map-side (a hot group ships at most ``hi-lo+3`` rows
    per map task), then dims -> dense array over the tiny sparse set.
    NULLs contribute nothing (percentile_disc ignores them); non-integral
    values count as overflow so the derived percentile goes NULL instead
    of silently truncating them into a wrong bucket."""
    n = _hist_len(lo, hi)
    v = F.col(col).cast("long")
    integral = F.col(col).cast("double") == v.cast("double")
    idx = (
        F.when(~integral, F.lit(n - 1))
        .when(v < lo, F.lit(0))
        .when(v > hi, F.lit(n - 1))
        .otherwise((v - F.lit(lo) + 1).cast("int"))
    )
    sparse = (
        df.filter(F.col(col).isNotNull())
        .select(*dim_names, idx.cast("int").alias("_h_idx"))
        .groupBy(*dim_names, "_h_idx")
        .agg(F.count(F.lit(1)).alias("_h_cnt"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_h_map"), i), F.lit(0).cast("long")
        ),
    )
    return (
        sparse.groupBy(*dim_names)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_h_idx", "_h_cnt"))
            ).alias("_h_map")
        )
        .select(*dim_names, dense.cast("array<bigint>").alias(name))
    )


def _hist_zero(n: int) -> F.Column:
    return F.array_repeat(F.lit(0).cast("long"), n)


def _hist_merge_expr(name: str, n: int) -> F.Column:
    """Element-wise sum of count vectors across a group's partial rows
    (bounded by the number of PARTIALS per dim combo — 2 at refresh)."""
    return (
        F.aggregate(
            F.collect_list(name),
            _hist_zero(n),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        )
        .cast("array<bigint>")
        .alias(name)
    )


def hist_percentile(name: str, lo: int, hi: int, pct: int) -> F.Column:
    """SQL-standard ``percentile_disc(pct/100)`` from the dense histogram:
    the smallest in-domain value whose cumulative count c satisfies
    c*100 >= pct*n — pure integer arithmetic (no float rank), exactly the
    rank rule DuckDB's percentile_disc implements. NULL when the group has
    out-of-domain/non-integral values (sentinel slots non-empty) or no
    in-domain values at all."""
    nvals = hi - lo + 1
    hist = F.col(name)
    vals = F.slice(hist, 2, nvals)
    total = F.aggregate(vals, F.lit(0).cast("long"), lambda a, x: a + x)
    oob = hist.getItem(0) + hist.getItem(nvals + 1)
    pairs = F.transform(
        vals, lambda x, i: F.struct(x.alias("c"), i.alias("i"))
    )
    acc = F.aggregate(
        pairs,
        F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.lit(None).cast("int").alias("k"),
        ),
        lambda a, p: F.struct(
            (a["cum"] + p["c"]).alias("cum"),
            F.coalesce(
                a["k"],
                F.when(
                    (a["cum"] + p["c"]) * F.lit(100) >= F.lit(pct) * total,
                    p["i"],
                ),
            ).alias("k"),
        ),
    )
    return F.when(
        (oob == 0) & (total > 0), (F.lit(lo) + acc["k"]).cast("long")
    )


# ------------------------------------------------------- heavy hitters ----
# topN rollups store the FULL value->count map per group (map<string,bigint>)
# under a declared distinct-cardinality cap: maps merge by key-union count
# addition, so the merged state is EXACT — no sketch error — as long as the
# group's distinct values stay within the cap (the common heavy-hitter
# columns: status codes, languages, domains, event types). The moment a
# delta or a merge would exceed the cap the state collapses to a sentinel
# and every derived topN reads NULL — honest, never silently wrong, same
# contract as the percentile histogram's out-of-domain slots.

FREQ_CAP_DEFAULT = 10_000
_FREQ_OVERFLOW = "__overflow__"

_TOP_RE = re.compile(r"^top([1-9][0-9]?)$")


def _top_of(fn: str) -> int | None:
    m = _TOP_RE.match(fn)
    return int(m.group(1)) if m else None


def _freq_sentinel() -> F.Column:
    return F.create_map(F.lit(_FREQ_OVERFLOW), F.lit(-1).cast("long"))


def _freq_zero() -> F.Column:
    return F.expr("cast(map() as map<string,bigint>)")


def _freq_capped(mcol: F.Column, cap: int) -> F.Column:
    return F.when(
        F.array_contains(F.map_keys(mcol), _FREQ_OVERFLOW)
        | (F.size(mcol) > cap),
        _freq_sentinel(),
    ).otherwise(mcol)


def _freq_delta(
    df: DataFrame, dims: list[str], col: str, name: str, cap: int
) -> DataFrame:
    """Per-group value->count map for the delta: exact per-(dims, value)
    counts first (partial-combining, the only corpus-sized stage), then a
    summary-scale fold into the map column."""
    per_val = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*dims, F.col(col).cast("string").alias("_fv"))
        .agg(F.count(F.lit(1)).cast("long").alias("_fc"))
    )
    m = per_val.groupBy(*dims).agg(
        F.map_from_entries(F.collect_list(F.struct("_fv", "_fc"))).alias(name)
    )
    return m.withColumn(name, _freq_capped(F.col(name), cap))


def _freq_merge_expr(name: str, cap: int) -> F.Column:
    """Key-union count addition across a group's partial maps (bounded by
    the number of PARTIALS per dim combo — 2 at refresh); overflow
    sentinels are sticky."""
    merged = F.aggregate(
        F.collect_list(name),
        _freq_zero(),
        lambda acc, m: F.map_zip_with(
            acc,
            m,
            lambda _, v1, v2: F.coalesce(v1, F.lit(0).cast("long"))
            + F.coalesce(v2, F.lit(0).cast("long")),
        ),
    )
    return _freq_capped(merged, cap).alias(name)


def freq_topn(name: str, n: int) -> F.Column:
    """Derive the top-n heavy hitters from the stored map as the canonical
    string ``value:count,value:count,...`` (count desc, value asc — fully
    deterministic, so driver-hashable and SQL-twin-reproducible). NULL on
    overflow or an empty group."""
    entries = F.expr(
        f"array_sort(map_entries({name}), (a, b) -> case"
        " when a.value > b.value then -1 when a.value < b.value then 1"
        " when a.key < b.key then -1 when a.key > b.key then 1 else 0 end)"
    )
    joined = F.array_join(
        F.transform(
            F.slice(entries, 1, n),
            lambda e: F.concat(
                e["key"], F.lit(":"), e["value"].cast("string")
            ),
        ),
        ",",
    )
    return F.when(
        (F.size(F.col(name)) > 0)
        & ~F.array_contains(F.map_keys(F.col(name)), _FREQ_OVERFLOW),
        joined,
    )


def _cap_of(caps: dict[str, int] | None, col: str) -> int:
    return int((caps or {}).get(col, FREQ_CAP_DEFAULT))


def _out_col(col: str, fn: str) -> str:
    return "cnt_rows" if fn == "count" else f"{fn}_{col}"


def _part_cols(aggs: list[tuple[str, str]]) -> dict[str, tuple[str, str]]:
    """Expand requested aggregates into the mergeable STORAGE parts:
    ``{storage_column: (part_kind, source_column)}``. avg and stddev on
    the same column share their psum/pcnt parts (dict keying dedups)."""
    parts: dict[str, tuple[str, str]] = {}
    for col, fn in aggs:
        if fn in ("sum", "count", "min", "max"):
            parts[_out_col(col, fn)] = (fn, col)
        elif fn == "avg":
            parts[f"psum_{col}"] = ("psum", col)
            parts[f"pcnt_{col}"] = ("pcnt", col)
        elif fn == "stddev":
            parts[f"psum_{col}"] = ("psum", col)
            parts[f"psumsq_{col}"] = ("psumsq", col)
            parts[f"pcnt_{col}"] = ("pcnt", col)
        elif fn == "distinct":
            parts[f"hll_{col}"] = ("hll", col)
        elif _top_of(fn) is not None:
            # every topN on the same column shares ONE frequency-map part
            parts[f"freq_{col}"] = ("freq", col)
        elif _pct_of(fn) is not None:
            # every pNN on the same column shares ONE histogram part
            parts[f"hist_{col}"] = ("hist", col)
        else:
            raise ValueError(f"unsupported rollup aggregate {fn!r}; use {_SUPPORTED}")
    return parts


def _domain_of(domains: dict[str, tuple[int, int]] | None, col: str) -> tuple[int, int]:
    if not domains or col not in domains:
        raise ValueError(
            f"percentile rollup over {col!r} needs a declared integer domain: "
            'pass domains={"%s": (lo, hi)} to create_rollup' % col
        )
    lo, hi = domains[col]
    if not (isinstance(lo, int) and isinstance(hi, int) and lo <= hi):
        raise ValueError(f"invalid histogram domain for {col!r}: {(lo, hi)!r}")
    return lo, hi


def _dim_cols(df: DataFrame, dims: list) -> tuple[DataFrame, list[str]]:
    """Resolve dims: a plain string groups by that column; a (name, sql)
    pair derives the dimension with ``F.expr`` first — the hypertable
    time-bucket shape (e.g. ``("hour_bucket", "date_trunc('HOUR', ts)")``)
    without the fact table having to materialize the bucket column."""
    names = []
    for d in dims:
        if isinstance(d, str):
            names.append(d)
        else:
            name, sql = d
            df = df.withColumn(name, F.expr(sql))
            names.append(name)
    return df, names


def _delta_agg(
    df: DataFrame,
    dims: list,
    aggs: list[tuple[str, str]],
    domains: dict[str, tuple[int, int]] | None = None,
    caps: dict[str, int] | None = None,
) -> DataFrame:
    df, dims = _dim_cols(df, dims)
    exprs, vectors = [], []
    for name, (kind, col) in _part_cols(aggs).items():
        if kind == "count":
            exprs.append(F.count(F.lit(1)).cast("long").alias(name))
        elif kind == "sum":
            exprs.append(F.sum(col).alias(name))
        elif kind == "min":
            exprs.append(F.min(col).alias(name))
        elif kind == "max":
            exprs.append(F.max(col).alias(name))
        elif kind == "psum":
            exprs.append(F.sum(col).alias(name))
        elif kind == "psumsq":
            exprs.append(F.sum(F.col(col) * F.col(col)).alias(name))
        elif kind == "hll":
            vectors.append((name, _hll_delta(df, dims, col, name), _hll_zero().cast("array<int>")))
        elif kind == "freq":
            vectors.append(
                (
                    name,
                    _freq_delta(df, dims, col, name, _cap_of(caps, col)),
                    _freq_zero(),
                )
            )
        elif kind == "hist":
            lo, hi = _domain_of(domains, col)
            vectors.append(
                (
                    name,
                    _hist_delta(df, dims, col, name, lo, hi),
                    _hist_zero(_hist_len(lo, hi)).cast("array<bigint>"),
                )
            )
        else:  # pcnt: NON-NULL count, the avg/stddev denominator
            exprs.append(F.count(col).cast("long").alias(name))
    out = (
        df.groupBy(*dims).agg(*exprs)
        if exprs
        else df.select(*dims).distinct()
    )
    # HLL register / histogram count vectors are built per column in their
    # own two-stage aggregation (see _hll_delta/_hist_delta) and joined
    # back on the dims — a summary-scale join. A group whose values were
    # all NULL gets the zero vector.
    for name, vec, zero in vectors:
        if dims:
            right = vec.select(
                *[F.col(d).alias(f"_v_d_{d}") for d in dims], name
            )
            cond = [F.col(d).eqNullSafe(F.col(f"_v_d_{d}")) for d in dims]
            out = out.join(right, cond, "left").drop(
                *[f"_v_d_{d}" for d in dims]
            )
        else:
            out = out.crossJoin(vec)
        out = out.withColumn(name, F.coalesce(F.col(name), zero))
    return out


def _dim_names(dims: list) -> list[str]:
    return [d if isinstance(d, str) else d[0] for d in dims]


def _merge_agg(
    df: DataFrame,
    dims: list,
    aggs: list[tuple[str, str]],
    domains: dict[str, tuple[int, int]] | None = None,
    caps: dict[str, int] | None = None,
) -> DataFrame:
    # partials already carry the (possibly derived) dimension columns
    dims = _dim_names(dims)
    exprs = []
    for name, (kind, col) in _part_cols(aggs).items():
        if kind == "min":
            merged = F.min(name)
        elif kind == "max":
            merged = F.max(name)
        elif kind == "hll":
            exprs.append(_hll_merge_expr(name))
            continue
        elif kind == "freq":
            exprs.append(_freq_merge_expr(name, _cap_of(caps, col)))
            continue
        elif kind == "hist":
            lo, hi = _domain_of(domains, col)
            exprs.append(_hist_merge_expr(name, _hist_len(lo, hi)))
            continue
        else:  # sum/count/psum/psumsq/pcnt are all additive
            merged = F.sum(name)
        if kind in ("count", "pcnt"):
            merged = merged.cast("long")
        exprs.append(merged.alias(name))
    return df.groupBy(*dims).agg(*exprs)


def create_rollup(
    lh,
    source: LakehouseTable,
    identifier: str,
    dims: list[str],
    aggs: list[tuple[str, str]],
    domains: dict[str, tuple[int, int]] | None = None,
    freq_caps: dict[str, int] | None = None,
) -> LakehouseTable:
    """Materialize ``source`` grouped by ``dims`` with mergeable ``aggs``
    (list of ``(column, fn)``; fn in sum/count/min/max/avg/stddev/distinct
    or ``pNN`` percentiles, column ignored for count; avg/stddev stored as
    decomposed psum/psumsq/pcnt parts, percentiles as an exact bounded
    histogram — read the requested shape back via :func:`read_rollup`)
    into a new lakehouse table, and record the maintenance contract
    (source dims/aggs/domains + the snapshot the state covers) in its
    properties.

    ``pNN`` aggregates require ``domains`` to declare the measure's closed
    integer domain, e.g. ``domains={"l_quantity": (1, 50)}``.

    The initial build is the one full pass; every later ``refresh_rollup``
    advances from the recorded snapshot cursor.
    """
    for col, fn in aggs:
        if fn not in _SUPPORTED and _pct_of(fn) is None and _top_of(fn) is None:
            raise ValueError(f"unsupported rollup aggregate {fn!r}; use {_SUPPORTED}")
        if _pct_of(fn) is not None:
            _domain_of(domains, col)  # validate eagerly, before any write
    covered = source.log.current_snapshot_id()
    state = _delta_agg(source.scan(), dims, aggs, domains, freq_caps)
    rollup = lh.create_table(identifier, state.schema)
    rollup.log.properties.update(
        {
            "rollup.source": source.table_dir,
            "rollup.dims": json.dumps(dims),
            "rollup.aggs": json.dumps(aggs),
            "rollup.domains": json.dumps(domains or {}),
            "rollup.freq-caps": json.dumps(freq_caps or {}),
            "rollup.last-snapshot": str(covered),
        }
    )
    rollup.append(state)
    return rollup


def _stored_domains(rollup: LakehouseTable) -> dict[str, tuple[int, int]]:
    raw = json.loads(rollup.log.properties.get("rollup.domains", "{}"))
    return {k: (int(v[0]), int(v[1])) for k, v in raw.items()}


def _stored_caps(rollup: LakehouseTable) -> dict[str, int]:
    raw = json.loads(rollup.log.properties.get("rollup.freq-caps", "{}"))
    return {k: int(v) for k, v in raw.items()}


def read_rollup(rollup: LakehouseTable) -> DataFrame:
    """Read the rollup in its REQUESTED-aggregate shape: dims plus one
    column per requested aggregate. sum/count/min/max read their stored
    column directly; avg and stddev are derived from the mergeable parts —
    avg = psum/pcnt, sample stddev = sqrt((psumsq - psum²/pcnt)/(pcnt-1)),
    NULL for empty/singleton populations.

    The derivation is a handful of scalar IEEE ops on exactly-merged
    parts, so (for integer-valued or decimal-routed measures) the result
    is bit-identical to a from-scratch avg/stddev over the fact table
    computed with the same formula — the property the differential oracle
    checks.
    """
    dims = _dim_names(json.loads(rollup.log.properties["rollup.dims"]))
    aggs = [tuple(a) for a in json.loads(rollup.log.properties["rollup.aggs"])]
    return _derive_requested(rollup.scan(), dims, aggs, _stored_domains(rollup))


def _derive_requested(
    df: DataFrame,
    dim_names: list[str],
    aggs: list[tuple[str, str]],
    domains: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Project summary-state rows (dims + mergeable parts) into the
    REQUESTED-aggregate shape."""
    cols: list = [F.col(d) for d in dim_names]
    for col, fn in aggs:
        if _pct_of(fn) is not None:
            lo, hi = _domain_of(domains, col)
            cols.append(
                hist_percentile(f"hist_{col}", lo, hi, _pct_of(fn)).alias(
                    f"{fn}_{col}"
                )
            )
        elif _top_of(fn) is not None:
            cols.append(
                freq_topn(f"freq_{col}", _top_of(fn)).alias(f"{fn}_{col}")
            )
        elif fn in ("sum", "count", "min", "max"):
            cols.append(F.col(_out_col(col, fn)))
        elif fn == "avg":
            n = F.col(f"pcnt_{col}").cast("double")
            cols.append(
                F.when(n > 0, F.col(f"psum_{col}") / n).alias(f"avg_{col}")
            )
        elif fn == "distinct":
            cols.append(hll_estimate(f"hll_{col}").alias(f"distinct_{col}"))
        else:  # stddev (sample)
            n = F.col(f"pcnt_{col}").cast("double")
            s = F.col(f"psum_{col}")
            ss = F.col(f"psumsq_{col}")
            var = (ss - s * s / n) / (n - F.lit(1.0))
            # FP rounding can push the derivation fractionally negative for
            # near-constant non-integer measures; clamp so stddev surfaces
            # 0.0 there, never NaN from sqrt of a tiny negative.
            var = F.greatest(var, F.lit(0.0))
            cols.append(F.when(n > 1, F.sqrt(var)).alias(f"stddev_{col}"))
    return df.select(*cols)


def reaggregate_rollup(rollup: LakehouseTable, dims: list) -> DataFrame:
    """Answer a COARSER aggregate query from the summary table without
    touching the fact table — the continuous-aggregate read path ("roll up
    the rollup"): an hourly rollup answers daily/weekly questions, a
    per-(a,b) rollup answers per-a questions.

    ``dims`` group the SUMMARY rows: plain strings name stored dimension
    columns; ``(name, sql)`` pairs derive coarser buckets from them (e.g.
    ``("day_bucket", "date_trunc('DAY', hour_bucket)")``). All stored
    aggregates re-merge exactly — sums/counts/psums add, min/max fold, and
    the avg/stddev parts stay decomposed until the final derivation, so a
    twice-merged average equals the from-scratch one bit-for-bit. Cost is
    O(|summary|) regardless of fact-table size.
    """
    aggs = [tuple(a) for a in json.loads(rollup.log.properties["rollup.aggs"])]
    domains = _stored_domains(rollup)
    df, names = _dim_cols(rollup.scan(), dims)
    merged = _merge_agg(df, names, aggs, domains, _stored_caps(rollup))
    return _derive_requested(merged, _dim_names(dims), aggs, domains)


def refresh_rollup(rollup: LakehouseTable, source: LakehouseTable) -> dict[str, Any]:
    """Advance the rollup to the source's current snapshot.

    Incremental path: aggregate ONLY the files appended since the recorded
    cursor (metadata-planned; the fact table is not rescanned) and merge
    the partials with the current summary rows. Fallback to a full
    recompute when the interval is not an append-only delta — overwrite /
    replace / delete snapshots void partial mins and double-count sums —
    or when the cursor snapshot was expired. Returns
    ``{"mode": "incremental"|"full"|"noop", "covered_snapshot": id}``;
    the mode is also recorded in the overwrite commit's summary so the
    maintenance history is auditable from the log alone.
    """
    dims = json.loads(rollup.log.properties["rollup.dims"])
    aggs = [tuple(a) for a in json.loads(rollup.log.properties["rollup.aggs"])]
    domains = _stored_domains(rollup)
    caps = _stored_caps(rollup)
    cursor = int(rollup.log.properties["rollup.last-snapshot"])
    head = source.log.current_snapshot_id()
    if head == cursor:
        return {"mode": "noop", "covered_snapshot": cursor}
    mode = "incremental"
    try:
        delta = source.read_incremental(cursor, head)
        state = _merge_agg(
            rollup.scan().unionByName(
                _delta_agg(delta, dims, aggs, domains, caps)
            ),
            dims,
            aggs,
            domains,
            caps,
        )
    except (ValueError, KeyError):
        # non-append history in the interval, or expired cursor: partials
        # cannot merge — recompute from the live snapshot instead
        mode = "full"
        state = _delta_agg(source.scan(), dims, aggs, domains, caps)
    # align to the rollup schema (summary tables are small; the overwrite
    # rewrites O(|dims-combinations|) rows, never fact-table bytes)
    state = state.select(*[f.name for f in rollup.schema().fields])
    rollup.log.properties["rollup.last-snapshot"] = str(head)
    rollup.overwrite(state, summary={"op": "rollup_refresh", "rollup.mode": mode})
    return {"mode": mode, "covered_snapshot": head}
