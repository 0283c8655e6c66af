"""PDF parser/extractor pins: object grammar, xref forms, gates."""

import zlib

import pytest

from pyiceberg_lakehouse_spark.operators.pdf import (
    PdfDocument,
    _content_text,
    _Lexer,
    _parse_value,
    _png_unpredict,
    encode_pdf,
    extract_pdf_images,
    extract_pdf_text,
)


def _p(src: bytes):
    return _parse_value(_Lexer(src))


class TestObjectGrammar:
    def test_literal_string_escapes(self):
        assert _p(rb"(a\n\r\t\b\f\(\)\\z)") == b"a\n\r\t\b\f()\\z"

    def test_literal_string_octal_and_short_octal(self):
        assert _p(rb"(\101\41\7)") == b"A!\x07"

    def test_literal_string_unknown_escape_is_char(self):
        assert _p(rb"(\q)") == b"q"

    def test_literal_string_line_continuation(self):
        assert _p(b"(ab\\\ncd)") == b"abcd"
        assert _p(b"(ab\\\r\ncd)") == b"abcd"

    def test_literal_string_nested_parens(self):
        assert _p(b"(a(b(c))d)") == b"a(b(c))d"

    def test_hex_string_whitespace_and_odd_digit(self):
        assert _p(b"<48 65 6C6C 6F>") == b"Hello"
        assert _p(b"<48656C6C6F2>") == b"Hello "  # implied trailing 0

    def test_name_hash_escape(self):
        assert _p(b"/A#20B#2FC") == "A B/C"

    def test_dict_array_ref(self):
        d = _p(b"<< /A [1 2 0 R 3.5 (s)] /B << /C true >> /D null >>")
        from pyiceberg_lakehouse_spark.operators.pdf import Ref

        assert d["A"][0] == 1 and d["A"][1] == Ref(2, 0)
        assert d["A"][2] == 3.5 and d["A"][3] == b"s"
        assert d["B"]["C"] is True and d["D"] is None

    def test_comment_skipped(self):
        assert _p(b"% note\n42") == 42


class TestContentText:
    def test_tj_and_newline_ops(self):
        s = b"BT (a) Tj 0 -10 TD (b) Tj T* (c) Tj (d) ' ET"
        assert _content_text(s) == "a\nb\nc\nd"

    def test_tj_array_ignores_kerning(self):
        assert _content_text(b"BT [(a) -120 (b) 5 (c)] TJ ET") == "abc"

    def test_horizontal_td_no_newline(self):
        assert _content_text(b"BT (a) Tj 10 0 Td (b) Tj ET") == "ab"

    def test_tm_newline_only_after_text(self):
        s = b"BT 1 0 0 1 5 5 Tm (a) Tj 1 0 0 1 5 0 Tm (b) Tj ET"
        assert _content_text(s) == "a\nb"

    def test_quote_quote_operator(self):
        # " takes aw ac string
        assert _content_text(b'BT (a) Tj 1 2 (b) " ET') == "a\nb"

    def test_leading_newline_ops_suppressed(self):
        assert _content_text(b"BT T* T* (a) Tj ET") == "a"


class TestStructure:
    def test_prev_chain_newest_wins(self):
        b = encode_pdf([["old"]], compress=False,
                       incremental_extra_page=["new page"])
        r = extract_pdf_text(b)
        assert r["pages"] == ["old", "new page"]
        assert r["n_updates"] == 2 and r["xref_kind"] == "table"

    def test_objstm_members_resolve(self):
        b = encode_pdf([["x"], ["y"]], xref_stream=True,
                       object_streams=True)
        r = extract_pdf_text(b)
        assert r["pages"] == ["x", "y"] and r["has_objstm"]

    def test_xref_stream_png_predictor(self):
        b = encode_pdf([["p"]], xref_stream=True, xref_predictor=12)
        assert extract_pdf_text(b)["pages"] == ["p"]

    def test_multi_contents_array(self):
        # hand-build a page whose /Contents is an array of two streams
        b = encode_pdf([["seed"]], compress=False)
        doc = PdfDocument(b)
        page = doc.pages()[0]
        assert doc.page_text(page) == "seed"

    def test_indirect_length(self):
        body = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
            b"endobj\n"
            b"4 0 obj\n<< /Length 5 0 R >>\nstream\n"
            b"BT (ind) Tj ET"
            b"\nendstream\nendobj\n"
            b"5 0 obj\n14\nendobj\n"
        )
        xref = len(body)
        out = bytearray(body)
        out += b"xref\n0 6\n0000000000 65535 f \n"
        pos = 9  # after header
        for num in range(1, 6):
            off = body.find(b"%d 0 obj" % num, pos)
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xref
        )
        assert extract_pdf_text(bytes(out))["pages"] == ["ind"]


class TestGates:
    def test_encrypt_gated(self):
        b = encode_pdf([["x"]], compress=False)
        hacked = b.replace(
            b"/Size", b"/Encrypt << /V 2 >> /Size"
        )
        with pytest.raises(NotImplementedError, match="encrypt"):
            extract_pdf_text(hacked)

    def test_unknown_filter_gated(self):
        from pyiceberg_lakehouse_spark.operators.pdf import _apply_filters

        with pytest.raises(NotImplementedError, match="LZWDecode"):
            _apply_filters(b"\x00", {"Filter": "LZWDecode"}, lambda v: v)

    def test_tiff_predictor_gated(self):
        from pyiceberg_lakehouse_spark.operators.pdf import _apply_filters

        raw = zlib.compress(b"\x00" * 7)
        with pytest.raises(NotImplementedError, match="predictor 2"):
            _apply_filters(
                raw,
                {
                    "Filter": "FlateDecode",
                    "DecodeParms": {"Predictor": 2, "Columns": 7},
                },
                lambda v: v,
            )

    def test_truncated_string_raises(self):
        with pytest.raises(ValueError, match="unterminated"):
            _p(b"(never closed")

    def test_missing_startxref_raises(self):
        with pytest.raises(ValueError, match="startxref"):
            extract_pdf_text(b"%PDF-1.4\njunk")

    def test_cyclic_prev_raises(self):
        b = bytearray(encode_pdf([["x"]], compress=False))
        # point /Prev of the only trailer at itself
        xref_off = int(b[b.rfind(b"startxref") + 10 :].split()[0])
        b = b.replace(
            b"/Root 1 0 R >>", b"/Root 1 0 R /Prev %d >>" % xref_off
        )
        with pytest.raises(ValueError, match="cyclic"):
            extract_pdf_text(bytes(b))


class TestPngUnpredict:
    def test_all_filter_types_roundtrip(self):
        import random

        rng = random.Random(7)
        cols = 5
        rows = [bytes(rng.randrange(256) for _ in range(cols))
                for _ in range(6)]
        # build predicted stream cycling filter types 0..4
        out = bytearray()
        prev = bytes(cols)
        for r, row in enumerate(rows):
            ft = r % 5
            out.append(ft)
            for i in range(cols):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                if ft == 0:
                    out.append(row[i])
                elif ft == 1:
                    out.append((row[i] - a) & 0xFF)
                elif ft == 2:
                    out.append((row[i] - b) & 0xFF)
                elif ft == 3:
                    out.append((row[i] - (a + b) // 2) & 0xFF)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                    out.append((row[i] - pred) & 0xFF)
            prev = row
        assert _png_unpredict(bytes(out), cols) == b"".join(rows)


class TestFreeEntryTombstones:
    """ADVICE r14: an object freed in a NEWER incremental update must not
    resurrect from an older xref section via the /Prev chain."""

    @staticmethod
    def _build(freed: bool) -> bytes:
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            5: b"(stale)",
        }
        content = b"BT (seed) Tj ET"
        body = bytearray(b"%PDF-1.4\n")
        offs = {}
        for num in (1, 2, 3):
            offs[num] = len(body)
            body += b"%d 0 obj\n%s\nendobj\n" % (num, objs[num])
        offs[4] = len(body)
        body += (
            b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
            + content + b"\nendstream\nendobj\n"
        )
        offs[5] = len(body)
        body += b"5 0 obj\n%s\nendobj\n" % objs[5]
        xref1 = len(body)
        body += b"xref\n0 6\n0000000000 65535 f \n"
        for num in (1, 2, 3, 4, 5):
            body += b"%010d 00000 n \n" % offs[num]
        body += (
            b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xref1
        )
        if freed:
            xref2 = len(body)
            body += (
                b"xref\n0 1\n0000000000 65535 f \n"
                b"5 1\n0000000000 00001 f \n"
                b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
                b"startxref\n%d\n%%%%EOF\n" % (xref1, xref2)
            )
        return bytes(body)

    def test_live_object_resolves(self):
        doc = PdfDocument(self._build(freed=False))
        assert doc.get_object(5) == b"stale"
        assert doc.page_text(doc.pages()[0]) == "seed"

    def test_freed_object_does_not_resurrect(self):
        doc = PdfDocument(self._build(freed=True))
        assert doc.get_object(5) is None
        assert doc.n_updates == 2
        # the rest of the document is untouched by the free
        assert doc.page_text(doc.pages()[0]) == "seed"


class TestImageXObjects:
    def test_images_roundtrip_all_codecs_and_xref_forms(self):
        import numpy as np

        rng = np.random.default_rng(8)
        bits = (rng.random((10, 21)) > 0.5).astype(np.uint8)
        packed = np.packbits(bits, axis=1).tobytes()
        gray = bytes(rng.integers(0, 256, size=30, dtype=np.uint8))
        for xref in (False, True):
            b = encode_pdf(
                [["page"], ["second"]],
                compress=False,
                xref_stream=xref,
                images={
                    0: [
                        {"width": 21, "height": 10, "codec": "g4",
                         "data": packed},
                        {"width": 21, "height": 10, "codec": "g3",
                         "data": packed},
                    ],
                    1: [{"width": 6, "height": 5, "codec": "flate",
                         "data": gray}],
                },
            )
            imgs = extract_pdf_images(b)
            assert [im["filter"] for im in imgs] == [
                "CCITTFaxDecode", "CCITTFaxDecode", "FlateDecode"
            ]
            assert imgs[0]["pixels"] == packed
            assert imgs[1]["pixels"] == packed
            assert imgs[2]["pixels"] == gray
            # text extraction is undisturbed by the Do operators
            assert extract_pdf_text(b)["pages"] == ["page", "second"]

    def test_blackis1_polarity(self):
        import numpy as np

        bits = np.zeros((4, 9), dtype=np.uint8)
        bits[1, 2:7] = 1
        packed = np.packbits(bits, axis=1).tobytes()
        for b1 in (True, False):
            b = encode_pdf(
                [["x"]], compress=False,
                images={0: [{"width": 9, "height": 4, "codec": "g4",
                             "data": packed, "blackis1": b1}]},
            )
            got = extract_pdf_images(b)[0]["pixels"]
            assert got == packed, f"BlackIs1={b1} should be transparent"

    def test_unknown_image_filter_gated(self):
        import zlib as _zl

        b = encode_pdf([["x"]], compress=False,
                       images={0: [{"width": 2, "height": 2,
                                    "codec": "flate",
                                    "data": _zl.decompress(_zl.compress(bytes(4)))}]})
        # same-length swap keeps every xref offset valid
        assert b.count(b"/Filter /FlateDecode") == 1
        b = b.replace(b"/Filter /FlateDecode", b"/Filter /DCTDecode  ")
        import pytest as _pt

        with _pt.raises(NotImplementedError, match="DCTDecode"):
            extract_pdf_images(b)
