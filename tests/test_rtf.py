"""RTF extractor pins: escapes, uc protocol, destinations, gates."""

import pytest

from pyiceberg_lakehouse_spark.operators.rtf import extract_rtf, make_rtf


def test_roundtrip_both_encode_paths():
    paras = ["Hello café €", "líne\ttwo\nthird", "em—dash {x} \\y"]
    for uni in (False, True):
        r = extract_rtf(make_rtf(paras, unicode_with_fallback=uni))
        assert r["text"] == "\n".join(paras), uni


def test_uc_fallback_skip_is_load_bearing():
    # \u233? : the '?' is the ANSI fallback and must NOT be emitted
    r = extract_rtf(b"{\\rtf1\\ansi\\uc1 caf\\u233?x}")
    assert r["text"] == "caféx"
    # \uc2 skips TWO fallback chars
    r = extract_rtf(b"{\\rtf1\\ansi\\uc2 a\\u233??b}")
    assert r["text"] == "aéb"


def test_negative_unicode_param():
    # \u-1536 encodes U+FA00 per the 16-bit signed convention
    r = extract_rtf(b"{\\rtf1 \\uc1 x\\u-1536?y}")
    assert r["text"] == "x切y"


def test_destinations_and_ignorable_groups_skipped():
    r = extract_rtf(
        b"{\\rtf1{\\fonttbl{\\f0 Arial;}}{\\*\\mystery hidden}"
        b"{\\info{\\author A}}visible}"
    )
    assert r["text"] == "visible"


def test_codepage_decodes_hex():
    # 0xE9 is e-acute in cp1252, U+0439 in cp1251
    assert extract_rtf(
        b"{\\rtf1\\ansicpg1252 \\'e9}"
    )["text"] == "é"
    assert extract_rtf(
        b"{\\rtf1\\ansicpg1251 \\'e9}"
    )["text"] == "й"


def test_control_symbols():
    r = extract_rtf(b"{\\rtf1 a\\~b\\-c\\_d\\{e\\}f\\\\g}")
    assert r["text"] == "a bc-d{e}f\\g"


def test_raw_newlines_ignored_par_breaks():
    r = extract_rtf(b"{\\rtf1 one\r\ntwo\\par three}")
    assert r["text"] == "onetwo\nthree"


def test_hostile_inputs():
    with pytest.raises(ValueError, match="rtf1"):
        extract_rtf(b"plain text")
    with pytest.raises(ValueError, match="unclosed"):
        extract_rtf(b"{\\rtf1 {group")
    with pytest.raises(ValueError, match="stray"):
        extract_rtf(b"{\\rtf1 }}")
    with pytest.raises(NotImplementedError, match="code page"):
        extract_rtf(b"{\\rtf1\\ansicpg99999 x}")
    with pytest.raises(ValueError, match="truncated"):
        extract_rtf(b"{\\rtf1 \\'e")
