"""Incrementally-maintained near-duplicate (banded MinHash-LSH) index.

The banded-LSH dedup path (operators/dedup.py::minhash_lsh_pairs)
re-signatures the whole corpus on every run; at 100 TB the signature
pass IS the cost — shingling and hashing every document again to ask
"does this new crawl batch duplicate anything we already have". This
module persists the banded signatures as a lakehouse table

    (doc_id, band, bh)

one row per (document, band), maintained with the rollup/text-index
cursor pattern: the index records the source snapshot it covers, and
``refresh_neardup_index`` shingles + minhashes ONLY the files appended
since that cursor (``read_incremental`` plans them from snapshot
metadata) and appends their band rows. Signatures are pure additions
under append-only history because a document appears in exactly one
append; non-append history (rewrites, deletes, a purge's audit
snapshot) voids that and falls back to a full rebuild, mode recorded.

Candidate retrieval is a join on (band, bh) — never a re-signature and
never all-pairs:

- ``neardup_candidates(idx)`` — all candidate pairs in the indexed
  corpus (self-join of the index with id_a < id_b).
- ``neardup_candidates(idx, probe_ids=...)`` — the incremental-crawl
  query: pairs where at least one side is a probe doc; cost is
  O(probe bands x bucket occupancy), the whole point of persisting.

Verification stays exact and candidate-only (verify_pairs_jaccard).
Reference parity: ashkangoleh/pyiceberg-lakehouse has no near-dup
surface at all; this follows the banded-LSH construction of Broder's
resemblance sketches as popularized for web-scale dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable
from pyiceberg_lakehouse_spark.operators.dedup import banded_signature_rows


def _spread_corpus(df: DataFrame, n_files: int) -> DataFrame:
    """Fan a corpus frame out before the signature pass when its FILE
    count caps scan parallelism below the session's cores (the
    shingle-explode + 32-hash fold is the cost — one small file would
    pin it to one core). File count is metadata the caller already
    holds; at production scale files >> cores, the condition is false,
    and no shuffle is added (guide §2.5 unsplittable-input rule)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par) if n_files < par else df


def _band_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    k: int,
) -> DataFrame:
    """(doc_id, band, bh) rows via THE shared banding construction
    (operators/dedup.py::banded_signature_rows — one implementation, so
    index and ad-hoc LSH band keys can never drift), with the storage
    types pinned for the persisted table. Docs shorter than k tokens
    have no shingles, hence no rows — they cannot near-duplicate
    anything through this index."""
    rows = banded_signature_rows(df, text_col, id_col, num_hashes, bands, k)
    return rows.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col("band").cast("int").alias("band"),
        "bh",
    )


def create_neardup_index(
    lh,
    source: LakehouseTable,
    name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> LakehouseTable:
    """Build the signature index over the source's current snapshot and
    record the cursor + hash-family parameters as table properties (the
    family is deterministic, so a refresh produces byte-identical band
    keys for identical text — the property block makes the contract
    auditable)."""
    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    head = source.log.current_snapshot_id()
    corpus = _spread_corpus(source.scan(), len(source.log.live_files()))
    rows_df = _band_rows(corpus, text_col, id_col, num_hashes, bands, k)
    idx = lh.create_table(
        name,
        rows_df.schema,
        properties={
            "neardup.text-col": text_col,
            "neardup.id-col": id_col,
            "neardup.num-hashes": str(num_hashes),
            "neardup.bands": str(bands),
            "neardup.k": str(k),
            "neardup.last-snapshot": str(head),
        },
    )
    idx.append(rows_df)
    return idx


def refresh_neardup_index(idx: LakehouseTable, source: LakehouseTable) -> dict:
    """Advance the index to the source head: signature the appended files
    only and APPEND their band rows (new documents cannot touch existing
    rows). Non-append history falls back to a full rebuild."""
    p = idx.log.properties
    text_col, id_col = p["neardup.text-col"], p["neardup.id-col"]
    num_hashes, bands, k = (
        int(p["neardup.num-hashes"]),
        int(p["neardup.bands"]),
        int(p["neardup.k"]),
    )
    cursor = int(p["neardup.last-snapshot"])
    head = source.log.current_snapshot_id()
    if head == cursor:
        return {"mode": "noop", "covered_snapshot": cursor}
    try:
        delta = source.read_incremental(cursor, head)
        n_delta_files = sum(
            len(s.added_files)
            for s in source.log.snapshots
            if cursor < s.snapshot_id <= head
        )
        new_rows = _band_rows(
            _spread_corpus(delta, n_delta_files),
            text_col, id_col, num_hashes, bands, k,
        )
        # cursor moves via set_properties AFTER the append commits: append's
        # concurrent-conflict retry resets in-memory properties from disk,
        # so a pre-mutated cursor would silently revert under a concurrent
        # writer and the next refresh would re-append the same delta.
        # Append-then-advance leaves only a crash window, where a re-append
        # is tolerated (candidate pairs are distinct()-deduped).
        idx.append(new_rows)
        idx.set_properties({"neardup.last-snapshot": str(head)})
        mode = "incremental"
    except (ValueError, KeyError):
        rows_df = _band_rows(
            _spread_corpus(source.scan(), len(source.log.live_files())),
            text_col, id_col, num_hashes, bands, k,
        )
        # overwrite never auto-retries (non-commutative), so the in-memory
        # mutation persists atomically with the commit or the commit raises
        idx.log.properties["neardup.last-snapshot"] = str(head)
        idx.overwrite(rows_df, summary={"op": "neardup_rebuild"})
        mode = "full"
    return {"mode": mode, "covered_snapshot": head}


def neardup_candidates(
    idx: LakehouseTable, probe_ids: DataFrame | None = None
) -> DataFrame:
    """Candidate pairs (id_a < id_b) from band-bucket collisions.

    With ``probe_ids`` (a one-column doc-id frame, e.g. the latest crawl
    batch), only pairs touching a probe doc are produced: the probe side
    is semi-joined down BEFORE the bucket join, so the big side of the
    join is the index scanned once and the shuffled probe side is
    batch-sized — the incremental-crawl economics. Candidates need exact
    verification (operators/dedup.py::verify_pairs_jaccard); banding
    only bounds what must be verified."""
    banded = idx.scan()
    if probe_ids is None:
        a = banded.select(F.col("doc_id").alias("id_a"), "band", "bh")
        b = banded.select(F.col("doc_id").alias("id_b"), "band", "bh")
        return (
            a.join(b, ["band", "bh"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    probe = probe_ids.toDF("doc_id")
    pa = banded.join(probe, "doc_id", "left_semi")
    a = pa.select(F.col("doc_id").alias("id_a"), "band", "bh")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
