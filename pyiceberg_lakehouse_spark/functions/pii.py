"""PII scrubbing for training corpora — pure Column expressions
(JVM-side, inside whole-stage codegen; NO Python in the hot path).

A pre-training pipeline must redact personally identifiable information
before text reaches a tokenizer. This module is the EXTENDED census —
phones, IPv4s, SSNs with boundary guards — on top of the corpus-level
URL+email scrubber in operators/text.py::scrub_pii (driver-prior
`text_pii_scrub`); at 100 TB either pass runs on every document, so
both are built ENTIRELY from pyspark.sql built-ins
(regexp_replace / regexp_count) — one codegen span, no Arrow round
trip, the same posture as the URL canonicalizer (functions/urls.py).

Patterns (deliberately conservative — a scrubber that over-matches
destroys training text; one that under-matches leaks; both are tested):

- email: RFC-5322-practical local@domain.tld;
- phone: NANP-style forms — optional +1, (555) 123-4567 / 555-123-4567
  / 555.123.4567 / +1 555 123 4567 — anchored on non-digit boundaries
  so order ids and timestamps don't match;
- IPv4: four dotted octets, each 0-255 enforced by pattern, anchored
  on non-digit/non-dot boundaries so version strings ("1.2.3.4.5")
  don't match;
- SSN: 123-45-6789 with the dashes mandatory (bare 9-digit runs are
  overwhelmingly NOT SSNs in crawl text);
- IBAN-ish/credit-card runs deliberately NOT matched: 13-19 digit runs
  are dominated by ids/ISBNs in practice — a real deployment plugs a
  Luhn-checking pandas_udf behind the same interface instead of
  regex-guessing.

Replacement tokens are stable strings (<EMAIL>/<PHONE>/<IP>/<SSN>) so
downstream dedup/counting stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = (
    r"(?<![\d.])(?:\+?1[ .\-]?)?(?:\(\d{3}\)[ .\-]?|\d{3}[ .\-])"
    r"\d{3}[ .\-]\d{4}(?![\d.])"
)
IPV4_RE = (
    r"(?<![\d.])(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?![\d.])"
)
SSN_RE = r"(?<![\d\-])\d{3}-\d{2}-\d{4}(?![\d\-])"

# order matters: emails contain dots and digits (scrub them first so
# the phone/IP patterns never see their innards); SSN before phone is
# irrelevant (phone needs 3-3-4, SSN is 3-2-4) but kept explicit
_PASSES = (
    (EMAIL_RE, "<EMAIL>"),
    (SSN_RE, "<SSN>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
)


def scrub_pii(text: Column) -> Column:
    """Redact emails/SSNs/phones/IPv4s -> stable tokens, JVM-only."""
    out = text
    for pattern, token in _PASSES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (regexp_count, JVM-only) — the audit
    columns a redaction job reports. Counted on the SAME pass order as
    scrub_pii (emails first), so counts always agree with the scrub."""
    counts: dict[str, Column] = {}
    cur = text
    for (pattern, token), name in zip(
        _PASSES, ("n_emails", "n_ssns", "n_phones", "n_ips")
    ):
        counts[name] = F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, token)
    return counts
