"""Sitemap parsing (sitemaps.org protocol) as pure Column expressions —
the crawl-frontier half of the robots/WARC ingest stack.

Both document kinds parse: ``<urlset>`` (page entries with loc /
lastmod / changefreq / priority) and ``<sitemapindex>`` (pointers to
child sitemaps, the >50k-URL sharding shape). Parsing runs entirely on
Spark's native ``from_xml`` expression — JVM-side, no Python
evaluator, no Exchange: kind detection falls out of the root-element
schema (a wrong-root parse yields NULL, so COALESCE routes), which is
stricter than string sniffing.

Size limits from the protocol (50,000 entries / 50 MB per file) are
the publisher's constraint, not the parser's; oversized files still
parse. Gzip-wrapped sitemaps arrive via the archive layer
(operators/archives.py), not here.

Reference parity: ashkangoleh/pyiceberg-lakehouse ingests crawl
metadata as opaque rows (main-daft.py:68); this engine reads the
frontier format itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URLSET_SCHEMA = (
    "url ARRAY<STRUCT<loc:STRING,lastmod:STRING,"
    "changefreq:STRING,priority:DOUBLE>>"
)
_INDEX_SCHEMA = "sitemap ARRAY<STRUCT<loc:STRING,lastmod:STRING>>"


def parse_sitemap(xml: Column) -> Column:
    """XML string -> array<struct<kind, loc, lastmod, changefreq,
    priority>>; one element per <url> or <sitemap> entry.

    ``kind`` is 'urlset' for page entries and 'sitemapindex' for child
    pointers (changefreq/priority NULL there — the index element has
    no such children in the protocol). Malformed XML or a foreign root
    yields an empty array, never a job failure.
    """
    pages = F.from_xml(xml, _URLSET_SCHEMA)["url"]
    subs = F.from_xml(xml, _INDEX_SCHEMA)["sitemap"]
    page_rows = F.transform(
        pages,
        lambda u: F.struct(
            F.lit("urlset").alias("kind"),
            u["loc"].alias("loc"),
            u["lastmod"].alias("lastmod"),
            u["changefreq"].alias("changefreq"),
            u["priority"].alias("priority"),
        ),
    )
    sub_rows = F.transform(
        subs,
        lambda s: F.struct(
            F.lit("sitemapindex").alias("kind"),
            s["loc"].alias("loc"),
            s["lastmod"].alias("lastmod"),
            F.lit(None).cast("string").alias("changefreq"),
            F.lit(None).cast("double").alias("priority"),
        ),
    )
    empty = F.array().cast(
        "array<struct<kind:string,loc:string,lastmod:string,"
        "changefreq:string,priority:double>>"
    )
    return F.coalesce(page_rows, sub_rows, empty)
