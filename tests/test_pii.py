"""Extended PII redaction (functions/pii.py): pattern precision on both
sides — real PII caught, decoys survive — and count/scrub agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.functions.pii import pii_counts, scrub_pii

CASES = [
    # (input, scrubbed, n_emails, n_ssns, n_phones, n_ips)
    ("write bob.smith+x@ex-mail.co.uk now", "write <EMAIL> now", 1, 0, 0, 0),
    ("call (555) 123-4567 or 555-123-4567", "call <PHONE> or <PHONE>",
     0, 0, 2, 0),
    ("+1 555 123 4567 ok", "<PHONE> ok", 0, 0, 1, 0),
    ("host 192.168.0.1 and 255.255.255.255", "host <IP> and <IP>",
     0, 0, 0, 2),
    # bounds-checked octets + five-part version strings survive
    ("not an ip 1.2.3.4.5 nor 999.1.1.1", "not an ip 1.2.3.4.5 nor 999.1.1.1",
     0, 0, 0, 0),
    ("ssn 123-45-6789.", "ssn <SSN>.", 0, 1, 0, 0),
    # 3-3-5 order numbers and long ids survive the phone pattern
    ("order 555-123-45678 stays", "order 555-123-45678 stays", 0, 0, 0, 0),
    ("id 1234567890123 stays", "id 1234567890123 stays", 0, 0, 0, 0),
    # email innards never double-match as phone/IP (emails scrub first)
    ("a@b.co vs 10.0.0.7 vs 212-555-0199", "<EMAIL> vs <IP> vs <PHONE>",
     1, 0, 1, 1),
    ("", "", 0, 0, 0, 0),
]


def test_patterns_and_counts(spark):
    df = spark.createDataFrame([(t,) for t, *_ in CASES], ["text"])
    counts = pii_counts(F.col("text"))
    got = df.select(
        "text",
        scrub_pii(F.col("text")).alias("s"),
        *[v.alias(k) for k, v in counts.items()],
    ).collect()
    by_text = {r["text"]: r for r in got}
    for t, want, ne, ns, np_, ni in CASES:
        r = by_text[t]
        assert r["s"] == want, (t, r["s"])
        assert (r["n_emails"], r["n_ssns"], r["n_phones"], r["n_ips"]) == (
            ne, ns, np_, ni
        ), t


def test_scrub_is_idempotent(spark):
    df = spark.createDataFrame([(t,) for t, *_ in CASES], ["text"])
    once = df.select(scrub_pii(F.col("text")).alias("s"))
    twice = once.select(scrub_pii(F.col("s")).alias("s"))
    assert [r["s"] for r in once.collect()] == [
        r["s"] for r in twice.collect()
    ]
