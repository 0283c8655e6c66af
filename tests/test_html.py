"""HTML text extraction (operators/html.py): block/inline semantics,
raw-text elements, entities, attributes, hostile markup."""

from __future__ import annotations

import pytest

from pyiceberg_lakehouse_spark.operators.html import (
    decode_entities,
    extract_html,
)


def test_block_vs_inline_newlines():
    r = extract_html(
        "<div>a<span>b</span>c</div><p>d</p>e<br>f"
    )
    assert r["text"] == "abc\nd\ne\nf"


def test_raw_text_elements_skip_literally():
    h = "<script>if (a < b && '</div>' != x) {}</script><p>t</p>"
    r = extract_html(h)
    assert r["text"] == "t"
    assert r["n_tags"] == 4
    for tag in ("style", "noscript", "template"):
        assert extract_html(f"<{tag}>drop <b>me</b></{tag}>ok")["text"] == "ok"
    with pytest.raises(ValueError, match="unterminated <script>"):
        extract_html("<script>never closed")


def test_entities_and_literal_lt():
    # &nbsp; decodes to the real U+00A0 (which the line collapser
    # then treats as whitespace)
    assert decode_entities("&amp;&lt;&gt;&quot;&apos;&nbsp;") == "&<>\"' "
    assert extract_html("<p>a&nbsp;&nbsp;b</p>")["text"] == "a b"
    assert decode_entities("&#65;&#x42;&#x7b;") == "AB{"
    assert decode_entities("&unknown; stays") == "&unknown; stays"
    # bare '<' followed by non-tag chars is text per HTML5
    assert extract_html("<p>5 < 6 and 2<3</p>")["text"] == "5 < 6 and 2<3"


def test_title_and_links():
    h = (
        '<title>T &amp; U</title><a href="/x?a=1&amp;2">one</a>'
        "<a name=anchor>no href</a><a href='y'>two</a>"
    )
    r = extract_html(h)
    assert r["title"] == "T & U"
    assert r["links"] == ["/x?a=1&2", "y"]
    assert extract_html("<p>no title</p>")["title"] is None


def test_attributes_quoting_and_selfclose():
    # '>' inside a quoted attribute must not end the tag
    r = extract_html('<img alt="a > b" src=pic.png />text')
    assert r["text"] == "text" and r["n_tags"] == 1
    # unquoted values and bare attributes
    r2 = extract_html("<input disabled value=3><p>x</p>")
    assert r2["text"] == "x"


def test_comments_doctype_whitespace():
    h = (
        "<!DOCTYPE html><!-- a <p>commented</p> out -->\n"
        "<p>  lots   of\t spaces  </p>\n\n<p></p><p>next</p>"
    )
    r = extract_html(h)
    assert r["text"] == "lots of spaces\nnext"
    with pytest.raises(ValueError, match="unterminated HTML comment"):
        extract_html("<!-- never")
    with pytest.raises(ValueError, match="unterminated tag"):
        extract_html("<p attr='v'")


def test_tables_and_lists_linebreak():
    h = "<ul><li>a</li><li>b</li></ul><table><tr><td>c</td><td>d</td></tr></table>"
    assert extract_html(h)["text"] == "a\nb\nc\nd"


class TestExtractMetadata:
    def _page(self):
        return (
            '<!DOCTYPE html><html lang="en"><head>'
            '<meta property="og:title" content="T &amp; Co">'
            '<meta content="https://i/x.jpg" property="og:image">'
            '<meta name="description" content="D1">'
            '<link rel="canonical" href="https://c/p?a=1&amp;b=2">'
            '<base href="https://b/">'
            "<script>var x = '<meta property=\"og:decoy\" content=\"x\">';"
            "</script>"
            '<script type="application/ld+json">{"@type":"Article",'
            '"headline":"H"}</script>'
            '</head><body><img src="a.png" alt="cap &amp; co">'
            '<img src="b.png"></body></html>'
        )

    def test_fields(self):
        from pyiceberg_lakehouse_spark.operators.html import (
            extract_metadata,
        )

        m = extract_metadata(self._page())
        assert m["og"] == {"title": "T & Co", "image": "https://i/x.jpg"}
        assert m["meta"] == {"description": "D1"}
        assert m["canonical"] == "https://c/p?a=1&b=2"
        assert m["lang"] == "en" and m["base"] == "https://b/"
        assert m["images"] == [("a.png", "cap & co"), ("b.png", "")]
        assert m["json_ld"] == ['{"@type":"Article","headline":"H"}']

    def test_script_decoy_never_leaks(self):
        from pyiceberg_lakehouse_spark.operators.html import (
            extract_metadata,
        )

        m = extract_metadata(self._page())
        assert "decoy" not in m["og"]

    def test_non_ldjson_script_not_collected(self):
        from pyiceberg_lakehouse_spark.operators.html import (
            extract_metadata,
        )

        m = extract_metadata(
            '<html><script type="text/javascript">{"a":1}</script></html>'
        )
        assert m["json_ld"] == []

    def test_unterminated_script_raises(self):
        import pytest

        from pyiceberg_lakehouse_spark.operators.html import (
            extract_metadata,
        )

        with pytest.raises(ValueError, match="unterminated"):
            extract_metadata("<html><script>oops</html>")


class TestDecodeHtmlBytes:
    def _d(self, body, ct=None):
        from pyiceberg_lakehouse_spark.operators.html import (
            decode_html_bytes,
        )

        return decode_html_bytes(body, ct)

    def test_boms_win_over_everything(self):
        t, cs, src = self._d(
            b"\xef\xbb\xbfhi \xe2\x82\xac",
            "text/html; charset=ISO-8859-1",
        )
        assert (t, cs, src) == ("hi €", "utf-8", "bom")
        t, cs, src = self._d(b"\xff\xfe" + "é😀".encode("utf-16-le"))
        assert (t, cs, src) == ("é😀", "utf-16le", "bom")
        t, cs, src = self._d(b"\xfe\xff" + "é".encode("utf-16-be"))
        assert (t, cs, src) == ("é", "utf-16be", "bom")

    def test_latin1_label_normalizes_to_cp1252(self):
        # 0x80 is the euro in cp1252; a literal latin-1 decode would
        # yield the C1 control U+0080
        t, cs, src = self._d(b"\x80", "text/html; charset=iso-8859-1")
        assert (t, cs, src) == ("€", "windows-1252", "http")

    def test_meta_charset_sniffed_in_first_1024(self):
        body = b'<meta charset="windows-1252">caf\xe9 \x92'
        t, cs, src = self._d(body, "text/html")
        assert cs == "windows-1252" and src == "meta"
        assert t.endswith("café ’")

    def test_meta_beyond_1024_is_ignored(self):
        body = b" " * 1100 + b'<meta charset="utf-16le">'
        _t, cs, src = self._d(body)
        assert (cs, src) == ("utf-8", "default")

    def test_default_utf8_then_cp1252(self):
        assert self._d("é".encode())[:3] == ("é", "utf-8", "default")
        t, cs, src = self._d(b"caf\xe9")  # invalid UTF-8
        assert (t, cs, src) == ("café", "windows-1252", "default")

    def test_unknown_label_falls_through(self):
        t, cs, src = self._d(b"ok", "text/html; charset=klingon")
        assert (t, cs, src) == ("ok", "utf-8", "default")
