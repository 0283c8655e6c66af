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


# RFC 3986 appendix-B reference regex, unchanged
_URI_RE = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"


def percent_decode(col: Column) -> Column:
    """RFC 3986 percent-decoding as a PURE Column expression (split ->
    transform -> conv -> char): each '%XX' escape becomes the byte XX.
    A '%' NOT followed by two hex digits (outside the RFC grammar)
    passes through VERBATIM — malformed input stays visible instead of
    silently dropping the segment (the conv/char chain would go NULL
    and array_join would eat it). Multi-byte UTF-8 escapes decode per
    byte, so non-ASCII sequences come back as their raw bytes —
    ASCII-safe, which is what the dedup/canonicalization hot path
    needs with no Python in the plan."""
    parts = F.split(col, "%")
    head = F.element_at(parts, 1)
    # slice needs an exact positive length: an open-ended sentinel
    # length makes transform see an EMPTY array
    rest = F.when(
        F.size(parts) > 1, F.slice(parts, 2, F.size(parts) - 1)
    ).otherwise(F.array().cast("array<string>"))
    decoded = F.transform(
        rest,
        lambda p: F.when(
            F.substring(p, 1, 2).rlike("^[0-9A-Fa-f]{2}$"),
            F.concat(
                F.char(F.conv(F.substring(p, 1, 2), 16, 10).cast("int")),
                F.substring(p, 3, 2147483647),
            ),
        ).otherwise(F.concat(F.lit("%"), p)),
    )
    return F.concat(head, F.array_join(decoded, ""))


def parse_uri(uri: Column) -> dict[str, Column]:
    """RFC 3986 decomposition via the spec's own appendix-B regex plus
    the authority userinfo@host:port split — every component a pure
    Column (no Python evaluator in the plan). Missing components are
    NULL (never ''), matching SQL semantics."""
    def _null_if_empty(c: Column) -> Column:
        return F.when(c == "", F.lit(None)).otherwise(c)

    scheme = _null_if_empty(F.regexp_extract(uri, _URI_RE, 2))
    authority = F.regexp_extract(uri, _URI_RE, 4)
    has_auth = F.regexp_extract(uri, _URI_RE, 3) != ""
    userinfo = _null_if_empty(
        F.regexp_extract(authority, r"^(([^@]*)@)?.*", 2)
    )
    hostport = F.regexp_extract(authority, r"^(?:[^@]*@)?(.*)$", 1)
    host = _null_if_empty(
        F.when(has_auth, F.regexp_extract(hostport, r"^([^:]*)", 1))
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when(has_auth & (port != ""), port.cast("int"))
    path = _null_if_empty(F.regexp_extract(uri, _URI_RE, 5))
    query = F.when(
        F.regexp_extract(uri, _URI_RE, 6) != "",
        F.regexp_extract(uri, _URI_RE, 7),
    )
    fragment = F.when(
        F.regexp_extract(uri, _URI_RE, 8) != "",
        F.regexp_extract(uri, _URI_RE, 9),
    )
    return {
        "scheme": scheme, "userinfo": userinfo, "host": host,
        "port": port, "path": path, "query": query, "fragment": fragment,
    }
