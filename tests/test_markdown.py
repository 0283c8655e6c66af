"""Markdown -> text extraction (functions/markdown.py): every stated
rule, plus the honestly-unparsed forms passing through as literal."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.functions.markdown import markdown_to_text


def _x(spark, md):
    return (
        spark.createDataFrame([(md,)], ["t"])
        .select(markdown_to_text(F.col("t")).alias("x"))
        .collect()[0]["x"]
    )


def test_full_document(spark):
    md = (
        "# Title 7\n\nSome **bold-2** and *em* text with `code-1` "
        "inline.\n\n```\nfenced 7\nline2\n```\n\n- item one 3\n"
        "- item [link-7](http://x/7) two\n\n> quote 2\n\n"
        "1. ordered ![img-7](u) end\n\n---\n\n"
        "tail _it_ and __b__ x_y stays"
    )
    want = (
        "Title 7\n\nSome bold-2 and em text with code-1 inline.\n\n"
        "item one 3\nitem link-7 two\n\nquote 2\n\nordered img-7 end\n\n"
        "tail it and b x_y stays"
    )
    assert _x(spark, md) == want


@pytest.mark.slow
def test_rule_by_rule(spark):
    cases = [
        ("### deep header", "deep header"),
        ("![alt text](http://u/i.png)", "alt text"),
        ("[label](u) and [two](v)", "label and two"),
        ("**b** *i* __b2__ _i2_", "b i b2 i2"),
        ("`code span`", "code span"),
        ("> quoted\n> lines", "quoted\nlines"),
        ("+ plus bullet\n* star bullet", "plus bullet\nstar bullet"),
        ("12. many-digit marker", "many-digit marker"),
        ("above\n\n\n\n\nbelow", "above\n\nbelow"),
        ("a\n-----\nb", "a\n\nb"),
        # honestly unparsed: literal pass-through, never corrupted
        ("[ref link][1] stays", "[ref link][1] stays"),
        ("| a | b |", "| a | b |"),
        ("snake_case_name stays", "snake_case_name stays"),
        # unterminated fence: no closing ``` -> rule does not fire
        ("```\nunclosed fence text", "```\nunclosed fence text"),
    ]
    for md, want in cases:
        assert _x(spark, md) == want, md
