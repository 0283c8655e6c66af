"""RTF text extraction in pure stdlib — the legacy word-processor
format older document corpora (and email attachments) still carry.

Implements the real token grammar, not a regex scrape: groups with a
proper state stack, control words with optional numeric parameters
and the single-space delimiter rule, control symbols, ``\\'hh`` hex
escapes decoded through the document's declared code page
(``\\ansicpg``), ``\\uN`` Unicode escapes with the ``\\ucN`` fallback-
skip protocol (the N characters following a ``\\u`` are the ANSI
fallback and must NOT be emitted twice), destination groups that
carry non-prose payloads ({\\fonttbl}, {\\colortbl}, {\\stylesheet},
{\\info}, {\\pict}...) skipped whole, and the ``{\\*\\...}`` ignorable-
destination rule (unknown starred groups skip — the RTF
forward-compatibility contract).

Text mapping: ``\\par``/``\\line`` -> newline, ``\\tab`` -> tab,
``\\~`` -> space, ``\\-`` -> '' (soft hyphen), ``\\_`` -> '-',
``\\{ \\} \\\\`` -> literals; raw CR/LF in the source are formatting
artifacts and are IGNORED per spec (only \\par breaks lines).

Honest gates: input not starting ``{\\rtf1`` raises; an unbalanced
group raises; an unsupported ``\\ansicpg`` code page raises rather
than mojibake.
"""

from __future__ import annotations

import re

_DEST_SKIP = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "footnote", "themedata", "colorschememapping",
    "listtable", "listoverridetable", "generator",
}

_CTRL = re.compile(rb"\\([a-z]+)(-?\d+)? ?|\\(.)", re.S)


def extract_rtf(data: bytes) -> dict:
    """RTF bytes -> {text, codepage, n_groups}."""
    if not data.startswith(b"{\\rtf1"):
        raise ValueError("not an RTF document (missing {\\rtf1 header)")
    codepage = "cp1252"
    out: list[str] = []
    # group state: (skipping, uc)
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc = 1
    n_groups = 0
    pos = 0
    n = len(data)
    pending_uc_skip = 0
    while pos < n:
        ch = data[pos]
        if ch == 0x7B:  # {
            stack.append((skipping, uc))
            n_groups += 1
            pos += 1
            # {\*\dest ...}: ignorable destination — skip unless known
            if data[pos : pos + 2] == b"\\*":
                skipping = True
                pos += 2
            continue
        if ch == 0x7D:  # }
            if not stack:
                raise ValueError("unbalanced RTF group (stray '}')")
            skipping, uc = stack.pop()
            pos += 1
            continue
        if ch == 0x5C:  # backslash
            m = _CTRL.match(data, pos)
            if not m:
                raise ValueError(f"bad RTF control at offset {pos}")
            pos = m.end()
            if m.group(3) is not None:  # control symbol
                sym = m.group(3)
                if sym == b"'":
                    if pos + 2 > n:
                        raise ValueError("truncated \\'hh escape")
                    byte = bytes([int(data[pos : pos + 2], 16)])
                    pos += 2
                    if pending_uc_skip > 0:
                        pending_uc_skip -= 1
                    elif not skipping:
                        try:
                            out.append(byte.decode(codepage))
                        except UnicodeDecodeError:
                            out.append("\ufffd")
                elif not skipping:
                    if sym in (b"\\", b"{", b"}"):
                        out.append(sym.decode())
                    elif sym == b"~":
                        out.append(" ")
                    elif sym == b"_":
                        out.append("-")
                    # \- soft hyphen, \* handled at '{': emit nothing
                continue
            word = m.group(1).decode()
            param = int(m.group(2)) if m.group(2) else None
            if word == "ansicpg":
                try:
                    b"\x41".decode(f"cp{param}")
                except LookupError:
                    raise NotImplementedError(
                        f"RTF code page {param} not available"
                    ) from None
                codepage = f"cp{param}"
            elif word == "uc":
                uc = param if param is not None else 1
            elif word == "u":
                if not skipping:
                    cp = param if param is not None else 0
                    if cp < 0:
                        cp += 65536
                    out.append(chr(cp))
                pending_uc_skip = uc
            elif word in _DEST_SKIP:
                skipping = True
            elif not skipping:
                if word in ("par", "line"):
                    out.append("\n")
                elif word == "tab":
                    out.append("\t")
                elif word == "emdash":
                    out.append("\u2014")
                elif word == "endash":
                    out.append("\u2013")
                # other control words: formatting, no text
            continue
        if ch in (0x0D, 0x0A):
            pos += 1  # raw newlines are artifacts, only \par breaks
            continue
        # plain text run up to the next special character
        end = pos
        while end < n and data[end] not in (0x5C, 0x7B, 0x7D, 0x0D, 0x0A):
            end += 1
        run = data[pos:end]
        if pending_uc_skip > 0:
            drop = min(pending_uc_skip, len(run))
            run = run[drop:]
            pending_uc_skip -= drop
        if not skipping and run:
            out.append(run.decode(codepage, "replace"))
        pos = end
    if stack:
        raise ValueError("unbalanced RTF group (unclosed '{')")
    return {
        "text": "".join(out).strip("\n"),
        "codepage": codepage,
        "n_groups": n_groups,
    }


def make_rtf(
    paragraphs: list[str],
    codepage: int = 1252,
    with_fonttbl: bool = True,
    unicode_with_fallback: bool = False,
) -> bytes:
    """Deterministic RTF for oracle constructions: non-ASCII characters
    in the declared code page write as ``\\'hh``; outside it (or when
    ``unicode_with_fallback``) as ``\\uN`` with a '?' ANSI fallback
    the reader must skip via the \\uc protocol."""
    enc = f"cp{codepage}"
    body: list[str] = []
    for i, p in enumerate(paragraphs):
        if i:
            body.append("\\par\n")
        for ch in p:
            if ch == "\n":
                body.append("\\line ")
            elif ch == "\t":
                body.append("\\tab ")
            elif ch in "\\{}":
                body.append("\\" + ch)
            elif ord(ch) < 128:
                body.append(ch)
            else:
                use_unicode = unicode_with_fallback
                raw = None
                if not use_unicode:
                    try:
                        raw = ch.encode(enc)
                    except UnicodeEncodeError:
                        use_unicode = True
                if use_unicode or raw is None:
                    cp = ord(ch)
                    if cp > 32767:
                        cp -= 65536
                    body.append(f"\\u{cp}?")
                else:
                    body.append(f"\\'{raw[0]:02x}")
    fonttbl = (
        "{\\fonttbl{\\f0\\froman Times New Roman;}}" if with_fonttbl else ""
    )
    return (
        f"{{\\rtf1\\ansi\\ansicpg{codepage}\\uc1 {fonttbl}"
        "{\\*\\generator lakehouse 1.0;}"
        + "".join(body)
        + "}"
    ).encode("ascii")
