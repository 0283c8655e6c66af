"""URL canonicalization — pure Column expressions (JVM-side, inside
whole-stage codegen; NO Python in the hot path).

The crawl-dedup normalizer: two URLs that differ only in case of
scheme/host, an explicit default port, a fragment, tracking
parameters, or query-parameter order are the same page. At 100 TB the
canonicalizer runs on every crawled row, so it is built ENTIRELY from
pyspark.sql built-ins (regexp_extract / filter / array_sort /
concat_ws) — the plan stays one codegen span, no Arrow round trip.

Canonical form:
- scheme and host lower-cased;
- explicit default ports dropped (http:80, https:443); other ports
  kept;
- path kept verbatim (case matters on most servers), empty path -> /;
- fragment dropped;
- tracking parameters dropped (utm_*, fbclid, gclid, ref, msclkid);
- remaining query parameters sorted bytewise and re-joined; an empty
  remainder drops the '?'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[^=]*|fbclid|gclid|ref|msclkid)(=.*)?$"


def canonicalize_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    path = F.regexp_extract(rest, r"^[^/?#]*(/[^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING),
        )
    )
    qs = F.array_join(kept, "&")
    port_part = F.when(
        (port == F.lit(""))
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
