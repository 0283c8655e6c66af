"""Incrementally-maintained inverted text index + BM25 lexical search.

The engine retrieves by embedding (similarity.py) but until now had no
LEXICAL retrieval — the other half of every real search/RAG stack. This
module maintains a postings table as a lakehouse table:

    (token, doc_id, tf, doc_len)

one row per distinct (token, document) pair, ``tf`` the term frequency and
``doc_len`` the document's token count (denormalized so scoring never
rejoins the corpus). Maintenance follows the rollup cursor pattern
(lakehouse/rollup.py): the index records the source snapshot it covers;
``refresh_text_index`` tokenizes ONLY the files appended since the cursor
(``read_incremental`` plans them from metadata — at 100 TB the corpus is
never re-read to keep search current) and appends their postings, falling
back to a full rebuild when the interval contains rewrites. Postings are
pure additions under append-only history because a document appears in
exactly one append.

Search:

- ``search_all_terms`` — boolean AND: postings for the query tokens only
  (an IN-list the scan prunes on), grouped by document, kept when every
  term matched. Cost is O(postings of the query terms), never O(corpus).
- ``bm25_topk`` — Okapi BM25 (k1=1.2, b=0.75): df and the corpus stats
  (N, avgdl) come from the index itself; scores round to 6 decimals
  before ranking so Spark and a SQL oracle order identically despite
  1-ulp ln() divergence (the tf_idf_top_terms device).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable

TOKEN_SPLIT = r"\s+"


def _postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias(
            "token"
        ),
    ).filter(F.length("token") > 0)
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("doc_len")
    )
    # doc-keyed join of two partial aggregates over the same exchange key
    return tf.join(dl, "doc_id").select("token", "doc_id", "tf", "doc_len")


def create_text_index(
    lh,
    source: LakehouseTable,
    identifier: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> LakehouseTable:
    """Materialize the postings table and record the maintenance contract
    (source + covered snapshot) in its properties."""
    covered = source.log.current_snapshot_id()
    postings = _postings(source.scan(), text_col, id_col)
    idx = lh.create_table(identifier, postings.schema)
    n_docs, sum_dl = _corpus_stats(postings)
    idx.log.properties.update(
        {
            "textindex.source": source.table_dir,
            "textindex.text-col": text_col,
            "textindex.id-col": id_col,
            "textindex.last-snapshot": str(covered),
            # corpus stats maintained as METADATA (additive under append):
            # BM25 reads N/avgdl from here instead of re-scanning the
            # whole postings table per query
            "textindex.n-docs": str(n_docs),
            "textindex.sum-doc-len": str(sum_dl),
        }
    )
    idx.append(postings)
    return idx


def _corpus_stats(postings: DataFrame) -> tuple[int, int]:
    row = (
        postings.select("doc_id", "doc_len")
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_len").alias("s"),
        )
        .collect()[0]
    )
    return int(row["n"] or 0), int(row["s"] or 0)


def refresh_text_index(idx: LakehouseTable, source: LakehouseTable) -> dict:
    """Advance the index to the source head: tokenize the appended files
    only and APPEND their postings (new documents cannot touch existing
    postings rows). Non-append history — rewrites, deletes, a purge's
    audit snapshot — voids that assumption and falls back to a full
    rebuild, mode recorded in the commit summary."""
    text_col = idx.log.properties["textindex.text-col"]
    id_col = idx.log.properties["textindex.id-col"]
    cursor = int(idx.log.properties["textindex.last-snapshot"])
    head = source.log.current_snapshot_id()
    if head == cursor:
        return {"mode": "noop", "covered_snapshot": cursor}
    try:
        delta = source.read_incremental(cursor, head)
        new_postings = _postings(delta, text_col, id_col)
        dn, ds = _corpus_stats(new_postings)
        # cursor + additive BM25 stats move via set_properties AFTER the
        # append commits: append's concurrent-conflict retry resets
        # in-memory properties from disk, so pre-mutated values would
        # silently revert under a concurrent writer — the next refresh
        # would then re-append the same postings AND double-count the
        # n-docs/sum-doc-len stats, skewing BM25. Append-then-advance
        # leaves only a crash window.
        idx.append(new_postings)
        idx.set_properties(
            {
                "textindex.last-snapshot": str(head),
                # stats are additive under append: new documents only
                "textindex.n-docs": str(
                    int(idx.log.properties.get("textindex.n-docs", "0")) + dn
                ),
                "textindex.sum-doc-len": str(
                    int(idx.log.properties.get("textindex.sum-doc-len", "0")) + ds
                ),
            }
        )
        mode = "incremental"
    except (ValueError, KeyError):
        postings = _postings(source.scan(), text_col, id_col)
        n, s = _corpus_stats(postings)
        idx.log.properties["textindex.last-snapshot"] = str(head)
        idx.log.properties["textindex.n-docs"] = str(n)
        idx.log.properties["textindex.sum-doc-len"] = str(s)
        idx.overwrite(postings, summary={"op": "textindex_rebuild"})
        mode = "full"
    return {"mode": mode, "covered_snapshot": head}


def search_all_terms(idx: LakehouseTable, terms: list[str]) -> DataFrame:
    """doc_ids containing EVERY query term (boolean AND). Scans only the
    query terms' postings."""
    want = sorted({t.lower() for t in terms})
    p = idx.scan().filter(F.col("token").isin(want))
    return (
        p.groupBy("doc_id")
        .agg(F.count_distinct("token").alias("_nt"))
        .filter(F.col("_nt") == len(want))
        .select("doc_id")
    )


def bm25_topk(
    idx: LakehouseTable,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k over the postings: (doc_id, score, rank).

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); the per-term weight is
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)). N and avgdl come
    from the index's PROPERTIES — maintained additively at refresh time —
    so a query plans exactly two things: the query terms' postings and
    their df aggregate; neither the corpus nor the full index is ever
    scanned. Scores round to 6 decimals BEFORE ranking (cross-engine
    1-ulp ln safety), doc_id breaks ties.
    """
    from pyspark.sql import Window as W

    want = sorted({t.lower() for t in terms})
    p = idx.scan().filter(F.col("token").isin(want))
    n_docs = int(idx.log.properties["textindex.n-docs"])
    sum_dl = int(idx.log.properties["textindex.sum-doc-len"])
    stats = idx.spark.range(1).select(
        F.lit(float(n_docs)).alias("n_docs"),
        # same arithmetic shape as avg(bigint): exact integer sum / count
        (F.lit(sum_dl).cast("double") / F.lit(float(n_docs))).alias("avgdl"),
    )
    dfreq = p.groupBy("token").agg(
        F.count_distinct("doc_id").cast("double").alias("df")
    )
    scored = (
        p.join(dfreq, "token")
        .join(F.broadcast(stats))
        .withColumn(
            "_w",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("doc_len") / F.col("avgdl")
                )
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(F.sum("_w"), 6).alias("score")
    )
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "score", "rank")
    )
