"""HTML -> text extraction — the crawl-to-corpus step.

Between the WARC reader (operators/warc.py) and the text-quality/
dedup operators sits the step that turns markup into training text.
This is a small deterministic extractor with explicit, documented
semantics (so differential oracles can state its output exactly):

- <script>, <style>, <noscript>, <template> subtrees are dropped
  whole (their text is code, not prose);
- block-level boundaries (p, div, br, li, tr, h1-h6, title, section,
  article, header, footer, ul, ol, table, blockquote, pre) emit a
  newline; inline tags (a, b, i, em, strong, span, code, u, small)
  vanish without one;
- HTML comments and doctypes vanish;
- character references decode: the HTML5 named set's working core
  (amp lt gt quot apos nbsp) plus ALL numeric forms (&#123; &#x7B;);
- whitespace collapses to single spaces within a line; leading/
  trailing space per line is stripped; empty lines are dropped.

Also extracted: the <title> text and every <a href> value (absolute
or not — URL resolution is the caller's policy), the curation
pipeline's link-graph inputs.

The tokenizer is a strict single pass over the byte string: malformed
markup (an unterminated tag or comment) raises ValueError rather than
guessing — a crawl extractor that guesses feeds garbage downstream.
Attribute values may contain '>' when quoted; the scanner honors
quotes.
"""

from __future__ import annotations

import re

_DROP_SUBTREE = {"script", "style", "noscript", "template"}
_BLOCK = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "title", "section", "article", "header", "footer", "ul", "ol",
    "table", "blockquote", "pre", "td", "th",
}
_NAMED = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ",
}
_ENTITY = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")
_WS = re.compile(r"[ \t\r\f\v ]+")


def decode_entities(s: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            return chr(int(body[2:], 16))
        if body.startswith("#"):
            return chr(int(body[1:]))
        return _NAMED.get(body.lower(), m.group(0))

    return _ENTITY.sub(sub, s)


def _scan_tag(html: str, i: int) -> tuple[str, dict[str, str], bool, int]:
    """Parse a tag starting at html[i] == '<'. Returns (name, attrs,
    is_close, end_index_after_gt). Quote-aware: '>' inside a quoted
    attribute value does not end the tag."""
    n = len(html)
    j = i + 1
    is_close = j < n and html[j] == "/"
    if is_close:
        j += 1
    start = j
    while j < n and (html[j].isalnum() or html[j] in "-_:"):
        j += 1
    name = html[start:j].lower()
    if not name:
        raise ValueError(f"malformed tag at offset {i}")
    attrs: dict[str, str] = {}
    while j < n:
        while j < n and html[j] in " \t\r\n":
            j += 1
        if j >= n:
            raise ValueError("unterminated tag")
        if html[j] == ">":
            return name, attrs, is_close, j + 1
        if html[j] == "/" and j + 1 < n and html[j + 1] == ">":
            return name, attrs, is_close, j + 2
        a0 = j
        while j < n and html[j] not in "=> \t\r\n/":
            j += 1
        aname = html[a0:j].lower()
        while j < n and html[j] in " \t\r\n":
            j += 1
        if j < n and html[j] == "=":
            j += 1
            while j < n and html[j] in " \t\r\n":
                j += 1
            if j < n and html[j] in "\"'":
                q = html[j]
                k = html.find(q, j + 1)
                if k < 0:
                    raise ValueError("unterminated attribute value")
                attrs[aname] = html[j + 1 : k]
                j = k + 1
            else:
                v0 = j
                while j < n and html[j] not in " \t\r\n>":
                    j += 1
                attrs[aname] = html[v0:j]
        elif aname:
            attrs[aname] = ""
    raise ValueError("unterminated tag")


def extract_html(html: str) -> dict:
    """-> {title, text, links (list of href strings), n_tags}."""
    n = len(html)
    i = 0
    pieces: list[str] = []
    title_pieces: list[str] | None = None
    links: list[str] = []
    in_title = False
    n_tags = 0
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            chunk = html[i:]
            i = n
        else:
            chunk = html[i:lt]
            i = lt
        if chunk:
            text = decode_entities(chunk)
            pieces.append(text)
            if in_title:
                title_pieces.append(text)
        if i >= n:
            break
        # a '<' that cannot start markup is literal text per HTML5
        if i + 1 < n and not (html[i + 1].isalpha() or html[i + 1] in "/!?"):
            pieces.append("<")
            i += 1
            continue
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            if end < 0:
                raise ValueError("unterminated HTML comment")
            i = end + 3
            continue
        if html.startswith("<!", i) or html.startswith("<?", i):
            end = html.find(">", i)
            if end < 0:
                raise ValueError("unterminated declaration")
            i = end + 1
            continue
        name, attrs, is_close, i = _scan_tag(html, i)
        n_tags += 1
        if not is_close and name in _DROP_SUBTREE:
            # HTML5 raw-text elements: content is NOT markup ('<p>' or
            # 'a < b' inside a script is script text) — skip literally
            # to the matching close tag
            m = re.compile(
                rf"</{name}\s*>", re.IGNORECASE
            ).search(html, i)
            if not m:
                raise ValueError(f"unterminated <{name}> element")
            i = m.end()
            n_tags += 1  # the close tag
            continue
        if name == "title":
            if is_close:
                in_title = False
            else:
                in_title = True
                title_pieces = title_pieces if title_pieces is not None else []
        if not is_close and name == "a" and "href" in attrs:
            links.append(decode_entities(attrs["href"]))
        if name in _BLOCK:
            pieces.append("\n")
    lines = []
    for ln in "".join(pieces).split("\n"):
        collapsed = _WS.sub(" ", ln).strip()
        if collapsed:
            lines.append(collapsed)
    title = (
        _WS.sub(" ", "".join(title_pieces)).strip()
        if title_pieces is not None
        else None
    )
    return {
        "title": title,
        "text": "\n".join(lines),
        "links": links,
        "n_tags": n_tags,
    }


_META_CHARSET = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([a-zA-Z0-9_\-]+)", re.IGNORECASE
)


def decode_html_bytes(
    body: bytes, http_content_type: str | None = None
) -> tuple[str, str, str]:
    """Crawl-body bytes -> (text, charset, source) per the WHATWG
    sniffing precedence a browser applies:

    1. a byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) wins over
       everything (source 'bom');
    2. else a charset parameter on the HTTP Content-Type ('http');
    3. else a <meta charset=...> / http-equiv form found in the first
       1024 bytes ('meta');
    4. else strict UTF-8, degrading to windows-1252 on invalid bytes
       ('default') — never a job failure.

    Per the WHATWG encoding standard, iso-8859-1/latin-1/ascii labels
    normalize to windows-1252 (the superset real pages mean: 0x80 is
    the euro sign, not a C1 control). Unknown labels fall through to
    the default path rather than raising — hostile charset labels are
    crawl reality.
    """

    def _normalize(label: str) -> str | None:
        label = label.strip().lower()
        if label in (
            "iso-8859-1", "iso8859-1", "latin-1", "latin1",
            "ascii", "us-ascii", "windows-1252", "cp1252",
        ):
            return "windows-1252"
        if label in ("utf-8", "utf8"):
            return "utf-8"
        if label in ("utf-16", "utf-16le"):
            return "utf-16le"
        if label == "utf-16be":
            return "utf-16be"
        return None

    if body.startswith(b"\xef\xbb\xbf"):
        return body[3:].decode("utf-8", "replace"), "utf-8", "bom"
    if body.startswith(b"\xff\xfe"):
        return body[2:].decode("utf-16-le", "replace"), "utf-16le", "bom"
    if body.startswith(b"\xfe\xff"):
        return body[2:].decode("utf-16-be", "replace"), "utf-16be", "bom"
    if http_content_type and "charset=" in http_content_type.lower():
        label = http_content_type.lower().split("charset=", 1)[1]
        label = label.split(";")[0].strip().strip('"').strip("'")
        enc = _normalize(label)
        if enc is not None:
            codec = {"utf-16le": "utf-16-le", "utf-16be": "utf-16-be"}.get(
                enc, enc
            )
            return body.decode(codec, "replace"), enc, "http"
    m = _META_CHARSET.search(body[:1024])
    if m:
        enc = _normalize(m.group(1).decode("latin-1"))
        if enc is not None:
            codec = {"utf-16le": "utf-16-le", "utf-16be": "utf-16-be"}.get(
                enc, enc
            )
            return body.decode(codec, "replace"), enc, "meta"
    try:
        return body.decode("utf-8"), "utf-8", "default"
    except UnicodeDecodeError:
        return body.decode("windows-1252", "replace"), "windows-1252", (
            "default"
        )


def extract_metadata(html: str) -> dict:
    """Structured page metadata — the caption-mining/curation fields.

    Walks the same strict tag scanner as ``extract_html`` and returns:

    - ``og``: dict of OpenGraph properties (``<meta property="og:x"
      content=...>`` with either attribute order) — the alt-text
      source image-caption pipelines (LAION-style) mine;
    - ``meta``: dict of ``<meta name=... content=...>`` values
      (description, robots, twitter:*);
    - ``json_ld``: list of raw JSON strings from
      ``<script type="application/ld+json">`` blocks (callers parse —
      schema.org payloads are arbitrary JSON);
    - ``images``: list of (src, alt) pairs from ``<img>`` tags, alt
      entity-decoded ('' when absent — absent alt is a curation
      signal, not an error);
    - ``canonical``: the ``<link rel="canonical">`` href or None;
    - ``lang``: the ``<html lang>`` attribute or None;
    - ``base``: the ``<base href>`` or None.

    Raw-text subtrees other than ld+json scripts are skipped whole,
    so a ``<meta>`` string inside ordinary JavaScript is never
    misread as metadata.
    """
    n = len(html)
    i = 0
    og: dict[str, str] = {}
    meta: dict[str, str] = {}
    json_ld: list[str] = []
    images: list[tuple[str, str]] = []
    canonical = lang = base = None
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            break
        i = lt
        if i + 1 < n and not (html[i + 1].isalpha() or html[i + 1] in "/!?"):
            i += 1
            continue
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            if end < 0:
                raise ValueError("unterminated HTML comment")
            i = end + 3
            continue
        if html.startswith("<!", i) or html.startswith("<?", i):
            end = html.find(">", i)
            if end < 0:
                raise ValueError("unterminated declaration")
            i = end + 1
            continue
        name, attrs, is_close, i = _scan_tag(html, i)
        if is_close:
            continue
        if name in _DROP_SUBTREE:
            m = re.compile(rf"</{name}\s*>", re.IGNORECASE).search(html, i)
            if not m:
                raise ValueError(f"unterminated <{name}> element")
            if (
                name == "script"
                and attrs.get("type", "").strip().lower()
                == "application/ld+json"
            ):
                json_ld.append(html[i : m.start()].strip())
            i = m.end()
            continue
        if name == "meta":
            content = decode_entities(attrs.get("content", ""))
            prop = attrs.get("property", "").lower()
            if prop.startswith("og:"):
                og[prop[3:]] = content
            elif "name" in attrs:
                meta[attrs["name"].lower()] = content
        elif name == "img":
            images.append(
                (
                    decode_entities(attrs.get("src", "")),
                    decode_entities(attrs.get("alt", "")),
                )
            )
        elif name == "link" and attrs.get("rel", "").lower() == "canonical":
            canonical = decode_entities(attrs.get("href", ""))
        elif name == "html" and "lang" in attrs:
            lang = attrs["lang"]
        elif name == "base" and "href" in attrs:
            base = decode_entities(attrs["href"])
    return {
        "og": og,
        "meta": meta,
        "json_ld": json_ld,
        "images": images,
        "canonical": canonical,
        "lang": lang,
        "base": base,
    }
