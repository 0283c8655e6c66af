"""PDF text extraction in pure stdlib — the dominant document-corpus
format a training-data pipeline must read.

Implements the real file structure, not a text scrape: the object
grammar (literal strings with nested parens + all eight escapes +
octal + line continuations, hex strings with embedded whitespace,
names with #xx escapes, arrays, dictionaries, indirect references),
BOTH cross-reference forms — the classic ``xref`` table with
subsections and the PDF 1.5 cross-reference STREAM (/W field widths,
/Index runs, PNG-predicted Flate via the full 0..4 unfilter) —
compressed object streams (/Type /ObjStm, type-2 xref entries),
incremental updates (the /Prev chain, newest definition wins), the
page-tree walk (/Pages-/Kids recursion, /Contents as one stream or an
array), FlateDecode content streams, and a deterministic text
assembler over the content-stream operators.

Text-assembly semantics (deliberately pinned, documented here because
every extractor must choose *some* convention):

- ``Tj`` shows its string; ``TJ`` concatenates its array's strings and
  IGNORES kerning numbers (no space inference — deterministic beats
  heuristic for dedup keys).
- ``T*``, ``'`` and ``\"`` start a new line (newline emitted only if the
  page already produced text); ``Td``/``TD`` with a non-zero ty and
  ``Tm`` likewise start a new line; ``Td`` with ty == 0 is a horizontal
  move and emits nothing.
- Multiple /Contents streams concatenate in array order; pages are
  returned separately (callers join).
- Strings decode as Latin-1 (PDFDocEncoding agrees with it over the
  printable range this engine emits).

The writer half (``encode_pdf``) exists so correctness can be proven
end-to-end with closed-form oracles: it emits deterministic PDFs
cycling every structural knob (classic table vs xref stream, object
streams on/off, Flate on/off, PNG Up predictor on xref streams, hex
vs literal strings, incremental updates) and its output is parsed by
the reader under test. The encoder is NOT byte-compatible with any
particular producer; it is spec-shaped input.

Honest gates (raise, never guess): /Encrypt anywhere in the trailer
chain, filters other than FlateDecode on the text path (LZWDecode,
DCTDecode, CCITTFaxDecode, JBIG2Decode, ASCIIHexDecode...), TIFF
predictor 2 on streams, and linearization hints are ignored (they are
advisory by spec).

Reference parity: ashkangoleh/pyiceberg-lakehouse ingests documents as
opaque binary/text rows (main-daft.py:68, upsert path); this engine
reads the bytes.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, NamedTuple

_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"


class Ref(NamedTuple):
    """An indirect reference ``num gen R``."""

    num: int
    gen: int


class Name(str):
    """A PDF name token (without the leading slash)."""

    __slots__ = ()


class _Keyword(str):
    """A bare keyword token (obj, stream, R, operators...)."""

    __slots__ = ()


class _Lexer:
    """Byte-level tokenizer over PDF object syntax.

    Shared by the file-body parser and the content-stream text
    assembler — the token grammar is identical (ISO 32000-1 §7.2).
    """

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        while self.pos < n:
            c = data[self.pos]
            if c in _WHITESPACE:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and data[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_raw(self, n: int) -> bytes:
        self._skip_ws()
        return self.data[self.pos : self.pos + n]

    def next_token(self) -> Any:
        """Return the next token or None at EOF.

        Tokens: int, float, bytes (string), Name, _Keyword, and the
        structural markers ``[ ] << >> { }`` as _Keyword.
        """
        self._skip_ws()
        data, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = data[self.pos]
        if c == 0x28:  # (
            return self._literal_string()
        if c == 0x3C:  # <
            if data[self.pos : self.pos + 2] == b"<<":
                self.pos += 2
                return _Keyword("<<")
            return self._hex_string()
        if c == 0x3E:  # >
            if data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return _Keyword(">>")
            raise ValueError(f"stray '>' at offset {self.pos}")
        if c == 0x2F:  # /
            return self._name()
        if c in b"[]{}":
            self.pos += 1
            return _Keyword(chr(c))
        if c in b"+-0123456789.":
            return self._number()
        # bare keyword: run of regular characters
        start = self.pos
        while (
            self.pos < n
            and data[self.pos] not in _WHITESPACE
            and data[self.pos] not in _DELIMS
        ):
            self.pos += 1
        if self.pos == start:
            raise ValueError(
                f"unexpected byte {data[start]:#x} at offset {start}"
            )
        return _Keyword(data[start : self.pos].decode("latin-1"))

    def _number(self) -> Any:
        data, n = self.data, len(self.data)
        start = self.pos
        self.pos += 1
        while self.pos < n and data[self.pos] in b"0123456789.+-":
            self.pos += 1
        tok = data[start : self.pos]
        if b"." in tok:
            return float(tok)
        return int(tok)

    def _literal_string(self) -> bytes:
        data, n = self.data, len(self.data)
        self.pos += 1  # (
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = data[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = data[self.pos]
                if e in b"nrtbf":
                    out.append(
                        {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e]
                    )
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"01234567":
                    val = 0
                    for _ in range(3):
                        if self.pos < n and data[self.pos] in b"01234567":
                            val = val * 8 + (data[self.pos] - 0x30)
                            self.pos += 1
                        else:
                            break
                    out.append(val & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if (
                        e == 0x0D
                        and self.pos < n
                        and data[self.pos] == 0x0A
                    ):
                        self.pos += 1
                else:  # unknown escape: the char itself (spec)
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("unterminated literal string")

    def _hex_string(self) -> bytes:
        data, n = self.data, len(self.data)
        self.pos += 1  # <
        digits = []
        while self.pos < n:
            c = data[self.pos]
            if c == 0x3E:
                self.pos += 1
                if len(digits) % 2:
                    digits.append("0")  # odd count: implied trailing 0
                return bytes.fromhex("".join(digits))
            if c in _WHITESPACE:
                self.pos += 1
                continue
            digits.append(chr(c))
            self.pos += 1
        raise ValueError("unterminated hex string")

    def _name(self) -> Name:
        data, n = self.data, len(self.data)
        self.pos += 1  # /
        out = bytearray()
        while (
            self.pos < n
            and data[self.pos] not in _WHITESPACE
            and data[self.pos] not in _DELIMS
        ):
            c = data[self.pos]
            if c == 0x23 and self.pos + 2 < n:  # #xx escape
                out.append(int(data[self.pos + 1 : self.pos + 3], 16))
                self.pos += 3
            else:
                out.append(c)
                self.pos += 1
        return Name(out.decode("latin-1"))


def _parse_value(lex: _Lexer, tok: Any = None) -> Any:
    """Parse one object starting from ``tok`` (or the next token)."""
    if tok is None:
        tok = lex.next_token()
    if tok is None:
        raise ValueError("unexpected EOF while parsing object")
    if isinstance(tok, _Keyword):
        if tok == "<<":
            d: dict[str, Any] = {}
            while True:
                k = lex.next_token()
                if isinstance(k, _Keyword) and k == ">>":
                    return d
                if not isinstance(k, Name):
                    raise ValueError(f"dict key is not a name: {k!r}")
                d[str(k)] = _parse_value(lex)
            # unreachable
        if tok == "[":
            arr: list[Any] = []
            while True:
                t = lex.next_token()
                if isinstance(t, _Keyword) and t == "]":
                    return arr
                v = _parse_value(lex, t)
                # reduce "num num R" to a Ref
                if (
                    isinstance(v, _Keyword)
                    and v == "R"
                    and len(arr) >= 2
                    and isinstance(arr[-1], int)
                    and isinstance(arr[-2], int)
                ):
                    gen = arr.pop()
                    num = arr.pop()
                    arr.append(Ref(num, gen))
                else:
                    arr.append(v)
            # unreachable
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "null":
            return None
        return tok  # bare keyword (R, obj, operators) — caller decides
    if isinstance(tok, int):
        # lookahead for "gen R"
        save = lex.pos
        t2 = lex.next_token()
        if isinstance(t2, int):
            t3 = lex.next_token()
            if isinstance(t3, _Keyword) and t3 == "R":
                return Ref(tok, t2)
        lex.pos = save
        return tok
    return tok  # float, bytes, Name


_PNG_FILTERS = 5


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Undo PNG row filters 0..4 over ``columns``-byte rows, bpp=1."""
    rowlen = columns + 1
    if len(data) % rowlen:
        raise ValueError("predicted stream length not a multiple of rows")
    out = bytearray()
    prev = bytearray(columns)
    for r in range(len(data) // rowlen):
        ft = data[r * rowlen]
        row = bytearray(data[r * rowlen + 1 : (r + 1) * rowlen])
        if ft >= _PNG_FILTERS:
            raise ValueError(f"bad PNG filter type {ft}")
        for i in range(columns):
            a = row[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if ft == 1:
                row[i] = (row[i] + a) & 0xFF
            elif ft == 2:
                row[i] = (row[i] + b) & 0xFF
            elif ft == 3:
                row[i] = (row[i] + (a + b) // 2) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _apply_filters(raw: bytes, sdict: dict, resolve) -> bytes:
    """Apply the stream's /Filter chain (FlateDecode only; gate rest)."""
    filt = resolve(sdict.get("Filter"))
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms = resolve(sdict.get("DecodeParms"))
    if parms is None:
        parms_list: list[Any] = [None] * len(filters)
    elif isinstance(parms, list):
        parms_list = [resolve(p) for p in parms]
    else:
        parms_list = [parms]
    data = raw
    for f, pm in zip(filters, parms_list):
        fname = str(resolve(f))
        if fname != "FlateDecode":
            raise NotImplementedError(
                f"PDF stream filter /{fname} is not supported "
                "(FlateDecode only; LZW/DCT/CCITT/JBIG2 are gated)"
            )
        data = zlib.decompress(data)
        if pm:
            pred = resolve(pm.get("Predictor", 1))
            if pred == 1:
                continue
            if pred >= 10:
                cols = resolve(pm.get("Columns", 1))
                data = _png_unpredict(data, int(cols))
            else:
                raise NotImplementedError(
                    f"PDF predictor {pred} is not supported "
                    "(PNG predictors 10..15 only; TIFF predictor 2 gated)"
                )
    return data


class PdfDocument:
    """Parsed PDF: xref chain resolved, objects loaded lazily."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        m = re.match(rb"%PDF-(\d+\.\d+)", data)
        if not m:
            raise ValueError("missing %PDF header")
        self.version = m.group(1).decode()
        # entries: num -> ("o", offset) | ("c", objstm_num, idx)
        self.entries: dict[int, tuple] = {}
        self.trailer: dict[str, Any] = {}
        self.xref_kind = ""  # kind of the NEWEST xref section
        self.n_updates = 0
        self.has_objstm = False
        self._cache: dict[int, Any] = {}
        self._objstm_cache: dict[int, list] = {}
        self._load_xref_chain()
        if "Encrypt" in self.trailer:
            raise NotImplementedError(
                "encrypted PDF (/Encrypt in trailer) is not supported — "
                "refusing rather than emitting garbage text"
            )

    # -- xref ----------------------------------------------------------
    def _load_xref_chain(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("missing startxref")
        offset = int(m.group(1))
        seen_offsets = set()
        while offset is not None:
            if offset in seen_offsets:
                raise ValueError("cyclic /Prev chain in xref")
            seen_offsets.add(offset)
            self.n_updates += 1
            lex = _Lexer(self.data, offset)
            if lex.peek_raw(4) == b"xref":
                trailer = self._load_xref_table(lex)
                kind = "table"
            else:
                trailer = self._load_xref_stream(offset)
                kind = "stream"
            if not self.xref_kind:
                self.xref_kind = kind
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            prev = trailer.get("Prev")
            offset = int(prev) if prev is not None else None

    def _load_xref_table(self, lex: _Lexer) -> dict:
        tok = lex.next_token()
        assert tok == "xref"
        while True:
            t = lex.next_token()
            if isinstance(t, _Keyword) and t == "trailer":
                return _parse_value(lex)
            first = int(t)
            count = int(lex.next_token())
            for i in range(count):
                f1 = lex.next_token()
                f2 = lex.next_token()
                kind = lex.next_token()
                num = first + i
                if num not in self.entries:
                    if str(kind) == "n":
                        self.entries[num] = ("o", int(f1))
                    else:
                        # free entry: tombstone it so an object deleted in
                        # a newer incremental update cannot resurrect from
                        # an older xref section via the /Prev chain
                        self.entries[num] = ("f",)
                del f2

    def _load_xref_stream(self, offset: int) -> dict:
        num, _gen, sdict, raw = self._parse_indirect_at(offset)
        data = _apply_filters(raw, sdict, self._resolve)
        if str(sdict.get("Type", "")) != "XRef":
            raise ValueError("startxref does not point at an XRef stream")
        w = [int(x) for x in sdict["W"]]
        size = int(sdict["Size"])
        index = sdict.get("Index", [0, size])
        index = [int(x) for x in index]
        rowlen = sum(w)
        pos = 0

        def field(row: bytes, k: int) -> int:
            s = sum(w[:k])
            return int.from_bytes(row[s : s + w[k]], "big") if w[k] else (
                1 if k == 0 else 0
            )

        for first, count in zip(index[::2], index[1::2]):
            for i in range(count):
                row = data[pos : pos + rowlen]
                pos += rowlen
                if len(row) < rowlen:
                    raise ValueError("truncated xref stream")
                typ = field(row, 0)
                f2 = field(row, 1)
                f3 = field(row, 2)
                onum = first + i
                if onum in self.entries:
                    continue
                if typ == 1:
                    self.entries[onum] = ("o", f2)
                elif typ == 2:
                    self.entries[onum] = ("c", f2, f3)
                else:  # type 0 = free: tombstone (newest-wins deletion)
                    self.entries[onum] = ("f",)
        del num
        return sdict

    # -- objects -------------------------------------------------------
    def _resolve(self, v: Any) -> Any:
        while isinstance(v, Ref):
            v = self.get_object(v.num)
        return v

    def _parse_indirect_at(
        self, offset: int
    ) -> tuple[int, int, Any, bytes | None]:
        """Parse ``num gen obj <object> [stream]`` at a byte offset."""
        lex = _Lexer(self.data, offset)
        num = lex.next_token()
        gen = lex.next_token()
        kw = lex.next_token()
        if not (isinstance(num, int) and isinstance(gen, int)
                and str(kw) == "obj"):
            raise ValueError(f"no indirect object at offset {offset}")
        obj = _parse_value(lex)
        raw = None
        save = lex.pos
        nxt = lex.next_token()
        if isinstance(nxt, _Keyword) and nxt == "stream":
            if not isinstance(obj, dict):
                raise ValueError("stream without a dictionary")
            # EOL after 'stream': CRLF or LF
            p = lex.pos
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] in (b"\n", b"\r"):
                p += 1
            length = self._resolve(obj["Length"])
            raw = self.data[p : p + int(length)]
        else:
            lex.pos = save
        return num, gen, obj, raw

    def get_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        ent = self.entries.get(num)
        if ent is None or ent[0] == "f":
            return None  # free/missing object resolves to null (spec)
        if ent[0] == "o":
            onum, _gen, obj, raw = self._parse_indirect_at(ent[1])
            if onum != num:
                raise ValueError(
                    f"xref says object {num} at {ent[1]}, found {onum}"
                )
            if raw is not None:
                obj = _Stream(obj, raw)
        else:
            self.has_objstm = True
            obj = self._objstm_member(ent[1], ent[2])
        self._cache[num] = obj
        return obj

    def _objstm_member(self, stm_num: int, idx: int) -> Any:
        if stm_num not in self._objstm_cache:
            stm = self.get_object(stm_num)
            if not isinstance(stm, _Stream):
                raise ValueError(f"object stream {stm_num} is not a stream")
            sd = stm.sdict
            if str(sd.get("Type", "")) != "ObjStm":
                raise ValueError(f"object {stm_num} is not /Type /ObjStm")
            data = _apply_filters(stm.raw, sd, self._resolve)
            n = int(self._resolve(sd["N"]))
            first = int(self._resolve(sd["First"]))
            hdr = _Lexer(data[:first])
            pairs = []
            for _ in range(n):
                onum = hdr.next_token()
                off = hdr.next_token()
                pairs.append((int(onum), int(off)))
            objs = []
            for onum, off in pairs:
                objs.append(
                    (onum, _parse_value(_Lexer(data, first + off)))
                )
            self._objstm_cache[stm_num] = objs
        return self._objstm_cache[stm_num][idx][1]

    def stream_data(self, obj: Any) -> bytes:
        obj = self._resolve(obj)
        if not isinstance(obj, _Stream):
            raise ValueError("expected a stream object")
        return _apply_filters(obj.raw, obj.sdict, self._resolve)

    # -- pages ---------------------------------------------------------
    def pages(self) -> list[dict]:
        root = self._resolve(self.trailer["Root"])
        tree = self._resolve(root["Pages"])
        out: list[dict] = []

        def walk(node: dict) -> None:
            typ = str(node.get("Type", ""))
            if typ == "Page":
                out.append(node)
                return
            for kid in self._resolve(node.get("Kids", [])):
                walk(self._resolve(kid))

        walk(tree)
        return out

    def page_text(self, page: dict) -> str:
        contents = self._resolve(page.get("Contents"))
        if contents is None:
            return ""
        streams = contents if isinstance(contents, list) else [contents]
        blob = b"\n".join(self.stream_data(s) for s in streams)
        return _content_text(blob)


class _Stream(NamedTuple):
    sdict: dict
    raw: bytes


_SHOW_OPS = {"Tj", "TJ", "'", '"'}


def _content_text(stream: bytes) -> str:
    """Assemble page text from a decoded content stream.

    Newline rules are pinned in the module docstring; kerning numbers
    inside TJ are ignored by design.
    """
    lex = _Lexer(stream)
    out: list[str] = []
    stack: list[Any] = []

    def newline() -> None:
        if out:
            out.append("\n")

    def show(val: Any) -> None:
        if isinstance(val, bytes):
            out.append(val.decode("latin-1"))

    while True:
        tok = lex.next_token()
        if tok is None:
            break
        if isinstance(tok, _Keyword) and tok not in ("<<", "["):
            op = str(tok)
            if op == "Tj":
                if stack:
                    show(stack[-1])
            elif op == "TJ":
                if stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        show(el)
            elif op == "'":
                newline()
                if stack:
                    show(stack[-1])
            elif op == '"':
                newline()
                if stack:
                    show(stack[-1])
            elif op == "T*":
                newline()
            elif op in ("Td", "TD"):
                if len(stack) >= 2 and stack[-1] != 0:
                    newline()
            elif op == "Tm":
                newline()
            stack.clear()
        else:
            stack.append(_parse_value(lex, tok))
    return "".join(out)


def extract_pdf_text(data: bytes) -> dict:
    """Parse a PDF and return its text and structural features.

    Returns ``{"version", "n_pages", "pages", "n_objects",
    "xref_kind", "has_objstm", "n_updates"}``. ``n_objects`` counts
    distinct in-use object numbers across the whole /Prev chain (a
    rewritten object counts once).
    """
    doc = PdfDocument(data)
    pages = doc.pages()
    texts = [doc.page_text(p) for p in pages]
    return {
        "version": doc.version,
        "n_pages": len(pages),
        "pages": texts,
        "n_objects": sum(1 for e in doc.entries.values() if e[0] != "f"),
        "xref_kind": doc.xref_kind,
        "has_objstm": doc.has_objstm,
        "n_updates": doc.n_updates,
    }


# ---------------------------------------------------------------------
# Writer — deterministic spec-shaped PDFs for closed-form oracles.
# ---------------------------------------------------------------------


def _esc_literal(s: str) -> bytes:
    out = bytearray(b"(")
    for ch in s.encode("latin-1"):
        if ch in b"()\\":
            out.append(0x5C)
            out.append(ch)
        elif ch == 0x0A:
            out += b"\\n"
        else:
            out.append(ch)
    out += b")"
    return bytes(out)


def _pdf_string(s: str, hex_strings: bool) -> bytes:
    if not hex_strings:
        return _esc_literal(s)
    hx = s.encode("latin-1").hex().upper()
    # embedded whitespace inside hex strings is legal; exercise it
    chunks = [hx[i : i + 8] for i in range(0, len(hx), 8)]
    return b"<" + " ".join(chunks).encode() + b">"


def _content_stream_ops(lines: list[str], hex_strings: bool) -> bytes:
    """The canonical op sequence: cycles Tj/TD/TJ/'/Tm/T* forms."""
    S = lambda t: _pdf_string(t, hex_strings)  # noqa: E731
    ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
    for i, line in enumerate(lines):
        if i == 0:
            ops.append(S(line) + b" Tj")
        elif i == 1:
            ops.append(b"0 -14 TD " + S(line) + b" Tj")
        elif i == 2:
            k = max(1, len(line) // 2)
            ops.append(
                b"T* [" + S(line[:k]) + b" -120 " + S(line[k:]) + b"] TJ"
            )
        elif i == 3:
            ops.append(S(line) + b" '")
        elif i == 4:
            ops.append(b"1 0 0 1 72 650 Tm " + S(line) + b" Tj")
        else:
            ops.append(b"T* " + S(line) + b" Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def _png_up_predict(data: bytes, columns: int) -> bytes:
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r : r + columns]
        out.append(2)  # Up
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def encode_pdf(
    pages: list[list[str]],
    *,
    compress: bool = True,
    xref_stream: bool = False,
    object_streams: bool = False,
    hex_strings: bool = False,
    xref_predictor: int | None = None,
    incremental_extra_page: list[str] | None = None,
    images: dict[int, list[dict]] | None = None,
) -> bytes:
    """Write a deterministic PDF showing ``pages`` (lines per page).

    ``object_streams`` requires ``xref_stream`` (type-2 entries only
    exist there). ``incremental_extra_page`` appends an incremental
    update (classic-table xref with /Prev) adding one page — the real
    shape of signed/annotated documents. ``images`` maps a page index
    to image-XObject specs ({width, height, codec 'g4'|'g3'|'flate'|
    'raw', data}) embedded with /Resources /XObject entries and a
    ``Do`` placement in the content stream — the scanned-page shape.
    """
    if object_streams and not xref_stream:
        raise ValueError("object streams require a cross-reference stream")
    n = len(pages)
    buf = bytearray()
    version = b"1.5" if xref_stream else b"1.4"
    buf += b"%PDF-" + version + b"\n%\xe2\xe3\xcf\xd3\n"
    offsets: dict[int, int] = {}
    # numbering: 1 catalog, 2 pages, 3 font, 4+2i page_i, 5+2i content_i
    page_nums = [4 + 2 * i for i in range(n)]
    content_nums = [5 + 2 * i for i in range(n)]
    max_num = 3 + 2 * n
    img_nums: dict[int, list[int]] = {}
    if images:
        for pi in sorted(images):
            if not 0 <= pi < n:
                raise ValueError(f"images refer to page {pi} of {n}")
            nums = []
            for _ in images[pi]:
                max_num += 1
                nums.append(max_num)
            img_nums[pi] = nums
    objstm_num = xrefobj_num = None
    if object_streams:
        max_num += 1
        objstm_num = max_num
    if xref_stream:
        max_num += 1
        xrefobj_num = max_num

    def body(num: int, payload: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(b"%d 0 obj\n" % num)
        buf.extend(payload)
        buf.extend(b"\nendobj\n")

    def stream_obj(num: int, sdict: bytes, data: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(b"%d 0 obj\n" % num)
        buf.extend(sdict)
        buf.extend(b"\nstream\n")
        buf.extend(data)
        buf.extend(b"\nendstream\nendobj\n")

    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_nums) + b"]"
    catalog = b"<< /Type /Catalog /Pages 2 0 R >>"
    pagesdict = b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % n
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    def _page_res(i: int) -> bytes:
        xo = b""
        if i in img_nums:
            items = b" ".join(
                b"/Im%d %d 0 R" % (k, nn)
                for k, nn in enumerate(img_nums[i])
            )
            xo = b" /XObject << " + items + b" >>"
        return b"/Resources << /Font << /F1 3 0 R >>" + xo + b" >>"

    pagedicts = [
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            + _page_res(i)
            + b" /Contents %d 0 R >>" % content_nums[i]
        )
        for i in range(n)
    ]

    plain_objs = [(1, catalog), (2, pagesdict), (3, font)] + list(
        zip(page_nums, pagedicts)
    )
    if object_streams:
        # pack all non-stream objects into one ObjStm
        header = bytearray()
        payload = bytearray()
        for onum, od in plain_objs:
            header += b"%d %d " % (onum, len(payload))
            payload += od + b"\n"
        stm = bytes(header) + bytes(payload)
        first = len(header)
        if compress:
            stm_out = zlib.compress(stm)
            filt = b" /Filter /FlateDecode"
        else:
            stm_out = stm
            filt = b""
        stream_obj(
            objstm_num,
            b"<< /Type /ObjStm /N %d /First %d /Length %d%s >>"
            % (len(plain_objs), first, len(stm_out), filt),
            stm_out,
        )
    else:
        for onum, od in plain_objs:
            body(onum, od)

    for i in range(n):
        cs = _content_stream_ops(pages[i], hex_strings)
        for k in range(len(img_nums.get(i, ()))):
            cs += b" q 72 0 0 72 100 100 cm /Im%d Do Q" % k
        if compress:
            data = zlib.compress(cs)
            filt = b" /Filter /FlateDecode"
        else:
            data = cs
            filt = b""
        stream_obj(
            content_nums[i],
            b"<< /Length %d%s >>" % (len(data), filt),
            data,
        )

    if img_nums:
        from pyiceberg_lakehouse_spark.operators import ccitt as _ccitt

        for pi, nums in img_nums.items():
            for spec, num in zip(images[pi], nums):
                w, h = int(spec["width"]), int(spec["height"])
                codec = spec["codec"]
                payload = spec["data"]
                bpc = 1 if codec in ("g4", "g3", "g3_2d") else 8
                black1 = bool(spec.get("blackis1", True))
                if codec in ("g4", "g3", "g3_2d") and not black1:
                    # the filter's output bits get inverted by the reader
                    # under the default BlackIs1=false, so store the
                    # complement (pad bits beyond width are never coded)
                    payload = bytes(b ^ 0xFF for b in payload)
                b1s = b"true" if black1 else b"false"
                if codec == "g4":
                    idata = _ccitt.g4_encode(payload, w, h)
                    filt = (
                        b" /Filter /CCITTFaxDecode /DecodeParms"
                        b" << /K -1 /Columns %d /Rows %d /BlackIs1 %s >>"
                        % (w, h, b1s)
                    )
                elif codec == "g3":
                    idata = _ccitt.g3_1d_encode(
                        payload, w, h, byte_align=True, with_eol=False
                    )
                    filt = (
                        b" /Filter /CCITTFaxDecode /DecodeParms"
                        b" << /K 0 /Columns %d /Rows %d /BlackIs1 %s"
                        b" /EncodedByteAlign true >>" % (w, h, b1s)
                    )
                elif codec == "g3_2d":
                    idata = _ccitt.g3_2d_encode(payload, w, h, k=2)
                    filt = (
                        b" /Filter /CCITTFaxDecode /DecodeParms"
                        b" << /K 2 /Columns %d /Rows %d /BlackIs1 %s >>"
                        % (w, h, b1s)
                    )
                elif codec == "flate":
                    idata = zlib.compress(payload)
                    filt = b" /Filter /FlateDecode"
                elif codec == "raw":
                    idata = payload
                    filt = b""
                else:
                    raise ValueError(f"unknown image codec {codec!r}")
                stream_obj(
                    num,
                    b"<< /Type /XObject /Subtype /Image /Width %d"
                    b" /Height %d /ColorSpace /DeviceGray"
                    b" /BitsPerComponent %d /Length %d%s >>"
                    % (w, h, bpc, len(idata), filt),
                    idata,
                )

    if xref_stream:
        # build entry rows: W = [1, 4, 2]
        size = max_num + 1
        rows = bytearray()
        objstm_members = {
            onum: idx for idx, (onum, _d) in enumerate(plain_objs)
        } if object_streams else {}
        xref_off = len(buf)
        offsets[xrefobj_num] = xref_off
        for onum in range(size):
            if onum == 0:
                rows += bytes([0]) + (0).to_bytes(4, "big") + (
                    0xFFFF
                ).to_bytes(2, "big")
            elif onum in objstm_members:
                rows += (
                    bytes([2])
                    + objstm_num.to_bytes(4, "big")
                    + objstm_members[onum].to_bytes(2, "big")
                )
            else:
                rows += (
                    bytes([1])
                    + offsets[onum].to_bytes(4, "big")
                    + (0).to_bytes(2, "big")
                )
        parms = b""
        if compress:
            if xref_predictor == 12:
                out = zlib.compress(_png_up_predict(bytes(rows), 7))
                parms = (
                    b" /Filter /FlateDecode"
                    b" /DecodeParms << /Predictor 12 /Columns 7 >>"
                )
            else:
                out = zlib.compress(bytes(rows))
                parms = b" /Filter /FlateDecode"
        else:
            out = bytes(rows)
        sdict = (
            b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R"
            b" /Length %d%s >>" % (size, len(out), parms)
        )
        buf.extend(b"%d 0 obj\n" % xrefobj_num)
        buf.extend(sdict)
        buf.extend(b"\nstream\n")
        buf.extend(out)
        buf.extend(b"\nendstream\nendobj\n")
        buf.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
        prev_xref_off = xref_off
    else:
        xref_off = len(buf)
        size = max_num + 1
        buf.extend(b"xref\n0 %d\n" % size)
        buf.extend(b"0000000000 65535 f \n")
        for onum in range(1, size):
            buf.extend(b"%010d 00000 n \n" % offsets[onum])
        buf.extend(
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (size, xref_off)
        )
        prev_xref_off = xref_off

    if incremental_extra_page is None:
        return bytes(buf)

    # ---- incremental update: add one page via a classic-table xref ----
    new_page = max_num + 1
    new_content = max_num + 2
    upd_offsets: dict[int, int] = {}
    kids2 = (
        b"["
        + b" ".join(b"%d 0 R" % p for p in page_nums + [new_page])
        + b"]"
    )
    upd_offsets[2] = len(buf)
    buf.extend(
        b"2 0 obj\n<< /Type /Pages /Kids %s /Count %d >>\nendobj\n"
        % (kids2, n + 1)
    )
    upd_offsets[new_page] = len(buf)
    buf.extend(
        b"%d 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
        b"\nendobj\n" % (new_page, new_content)
    )
    cs = _content_stream_ops(incremental_extra_page, hex_strings)
    if compress:
        data = zlib.compress(cs)
        filt = b" /Filter /FlateDecode"
    else:
        data = cs
        filt = b""
    upd_offsets[new_content] = len(buf)
    buf.extend(
        b"%d 0 obj\n<< /Length %d%s >>\nstream\n" % (new_content, len(data), filt)
    )
    buf.extend(data)
    buf.extend(b"\nendstream\nendobj\n")
    xref2 = len(buf)
    buf.extend(b"xref\n0 1\n0000000000 65535 f \n")
    buf.extend(b"2 1\n%010d 00000 n \n" % upd_offsets[2])
    buf.extend(
        b"%d 2\n%010d 00000 n \n%010d 00000 n \n"
        % (new_page, upd_offsets[new_page], upd_offsets[new_content])
    )
    buf.extend(
        b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (new_content + 1, prev_xref_off, xref2)
    )
    return bytes(buf)


def extract_pdf_images(data: bytes) -> list[dict]:
    """Image XObjects from every page — the scanned-document surface
    (a scanned PDF is one CCITT- or Flate-compressed image per page).

    Walks each page's /Resources /XObject dictionary, decodes
    /FlateDecode and /CCITTFaxDecode (K<0 pure-2-D G4 via
    operators/ccitt.py, K=0 1-D G3 honoring /EncodedByteAlign;
    K>0 mixed G3 gated) with /BlackIs1 honored either way, and returns
    one dict per image: {page, name, width, height, bpc, filter,
    pixels} where pixels are packed 1-bit rows (1 = black) for bilevel
    images and raw gray bytes for 8-bit ones. Unknown image filters
    (DCT/JPX/JBIG2) raise rather than emitting compressed bytes."""
    doc = PdfDocument(data)
    out: list[dict] = []
    for pi, page in enumerate(doc.pages()):
        res = doc._resolve(page.get("Resources"))
        if not isinstance(res, dict):
            continue
        xo = doc._resolve(res.get("XObject"))
        if not isinstance(xo, dict):
            continue
        for name in sorted(xo, key=str):
            obj = doc._resolve(xo[name])
            if not isinstance(obj, _Stream):
                continue
            sd = obj.sdict
            if str(sd.get("Subtype", "")) != "Image":
                continue
            w = int(doc._resolve(sd.get("Width")))
            h = int(doc._resolve(sd.get("Height")))
            bpc = int(doc._resolve(sd.get("BitsPerComponent", 8)))
            filt = doc._resolve(sd.get("Filter"))
            if isinstance(filt, list):
                if len(filt) != 1:
                    raise NotImplementedError(
                        "image filter chains are not supported"
                    )
                filt = doc._resolve(filt[0])
            fname = str(filt) if filt is not None else "none"
            raw = obj.raw
            if fname == "none":
                pixels = raw
            elif fname == "FlateDecode":
                try:
                    pixels = zlib.decompress(raw)
                except zlib.error as exc:
                    raise ValueError(f"corrupt image Flate data: {exc}") from exc
            elif fname == "CCITTFaxDecode":
                from pyiceberg_lakehouse_spark.operators import ccitt as _ccitt

                parms = doc._resolve(sd.get("DecodeParms")) or {}
                if isinstance(parms, list):
                    parms = doc._resolve(parms[0]) or {}
                k = int(doc._resolve(parms.get("K", 0)))
                cols = int(doc._resolve(parms.get("Columns", 1728)))
                rows = int(doc._resolve(parms.get("Rows", h)))
                byte_align = bool(
                    doc._resolve(parms.get("EncodedByteAlign", False))
                )
                black1 = bool(doc._resolve(parms.get("BlackIs1", False)))
                if k < 0:
                    pixels = _ccitt.g4_decode(raw, cols, rows)
                elif k == 0:
                    pixels = _ccitt.g3_1d_decode(
                        raw, cols, rows,
                        byte_align=byte_align, with_eol=False,
                    )
                else:  # K>0: EOL-tagged mixed 1-D/2-D rows
                    pixels = _ccitt.g3_2d_decode(raw, cols, rows)
                if not black1:  # PDF default: 0 bits are black
                    pixels = bytes(b ^ 0xFF for b in pixels)
                    # re-mask the row padding bits to zero
                    rb = (cols + 7) // 8
                    if cols % 8:
                        mask = 0xFF << (8 - cols % 8) & 0xFF
                        px = bytearray(pixels)
                        for y in range(rows):
                            px[y * rb + rb - 1] &= mask
                        pixels = bytes(px)
            else:
                raise NotImplementedError(
                    f"image filter {fname} is not supported (refusing to"
                    " emit compressed bytes as pixels)"
                )
            out.append(
                {
                    "page": pi, "name": str(name), "width": w, "height": h,
                    "bpc": bpc, "filter": fname, "pixels": pixels,
                }
            )
    return out
