"""EPUB and DOCX text extraction — the ebook and office-document
formats a book/document corpus actually ships, built on the engine's
own layers: both formats ARE zip archives (operators/archives.py
explodes them, including the streaming/data-descriptor form), their
structure is XML (stdlib xml.etree, a real parser — namespace-aware,
not regex), and EPUB chapter markup routes through the deterministic
HTML extractor (operators/html.py).

EPUB (IDPF/W3C): the ``mimetype`` entry, ``META-INF/container.xml``
naming the OPF package file, the OPF ``<manifest>`` (id -> href) and
``<spine>`` (reading order by idref) — chapters extract IN SPINE
ORDER, not zip order (the zip order is arbitrary; a reader that
ignores the spine shuffles the book). Metadata from the OPF
``dc:title`` / ``dc:creator`` / ``dc:language``.

DOCX (ECMA-376 / OOXML): ``word/document.xml`` paragraphs — ``<w:p>``
blocks, ``<w:r>`` runs, ``<w:t>`` text (``xml:space`` honored by the
XML parser), ``<w:br/>`` line breaks and ``<w:tab/>`` tabs inside a
paragraph, paragraph style names from ``<w:pStyle w:val>``; document
metadata from ``docProps/core.xml`` (``dc:title``, ``dc:creator``).

Honest gates (raise, never guess): an EPUB without the container.xml
rootfile or with spine idrefs missing from the manifest; a DOCX
without word/document.xml. Embedded media (images inside either
container) is exposed by the archive layer, not silently dropped
here — callers route those bytes to the image codecs.

Reference parity: ashkangoleh/pyiceberg-lakehouse ingests documents
as opaque rows (main-daft.py:68); this engine reads the books.
"""

from __future__ import annotations

import posixpath
import xml.etree.ElementTree as ET

from pyiceberg_lakehouse_spark.operators.archives import parse_zip
from pyiceberg_lakehouse_spark.operators.html import extract_html

_CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"
_DC_NS = "http://purl.org/dc/elements/1.1/"
_W_NS = (
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
)


def extract_epub(data: bytes) -> dict:
    """EPUB bytes -> {title, creator, language, chapters: [{href,
    title, text}], text (chapters joined by form-feed), n_entries}."""
    entries = {e["name"]: e["data"] for e in parse_zip(data)}
    container = entries.get("META-INF/container.xml")
    if container is None:
        raise ValueError("EPUB without META-INF/container.xml")
    root = ET.fromstring(container)
    rf = root.find(f".//{{{_CONTAINER_NS}}}rootfile")
    if rf is None or "full-path" not in rf.attrib:
        raise ValueError("EPUB container.xml without a rootfile")
    opf_path = rf.attrib["full-path"]
    opf_data = entries.get(opf_path)
    if opf_data is None:
        raise ValueError(f"EPUB rootfile {opf_path!r} missing from zip")
    opf = ET.fromstring(opf_data)
    meta = {"title": None, "creator": None, "language": None}
    for key in meta:
        el = opf.find(f".//{{{_DC_NS}}}{key}")
        if el is not None and el.text:
            meta[key] = el.text
    manifest = {
        item.attrib["id"]: item.attrib["href"]
        for item in opf.findall(f".//{{{_OPF_NS}}}item")
    }
    base = posixpath.dirname(opf_path)
    chapters = []
    for itemref in opf.findall(f".//{{{_OPF_NS}}}itemref"):
        idref = itemref.attrib.get("idref")
        href = manifest.get(idref)
        if href is None:
            raise ValueError(
                f"EPUB spine idref {idref!r} missing from the manifest"
            )
        path = posixpath.normpath(posixpath.join(base, href))
        blob = entries.get(path)
        if blob is None:
            raise ValueError(f"EPUB chapter {path!r} missing from zip")
        page = extract_html(blob.decode("utf-8"))
        chapters.append(
            {"href": href, "title": page["title"], "text": page["text"]}
        )
    return {
        **meta,
        "chapters": chapters,
        "text": "\f".join(c["text"] for c in chapters),
        "n_entries": len(entries),
    }


def extract_docx(data: bytes) -> dict:
    """DOCX bytes -> {title, creator, paragraphs: [{style, text}],
    text (paragraphs joined by newline), n_entries}."""
    entries = {e["name"]: e["data"] for e in parse_zip(data)}
    doc = entries.get("word/document.xml")
    if doc is None:
        raise ValueError("DOCX without word/document.xml")
    root = ET.fromstring(doc)
    paragraphs = []
    for p in root.iter(f"{{{_W_NS}}}p"):
        style = None
        ps = p.find(f"{{{_W_NS}}}pPr/{{{_W_NS}}}pStyle")
        if ps is not None:
            style = ps.attrib.get(f"{{{_W_NS}}}val")
        parts: list[str] = []
        for el in p.iter():
            tag = el.tag
            if tag == f"{{{_W_NS}}}t":
                parts.append(el.text or "")
            elif tag == f"{{{_W_NS}}}br":
                parts.append("\n")
            elif tag == f"{{{_W_NS}}}tab":
                parts.append("\t")
        paragraphs.append({"style": style, "text": "".join(parts)})
    title = creator = None
    core = entries.get("docProps/core.xml")
    if core is not None:
        croot = ET.fromstring(core)
        t = croot.find(f"{{{_DC_NS}}}title")
        c = croot.find(f"{{{_DC_NS}}}creator")
        title = t.text if t is not None else None
        creator = c.text if c is not None else None
    return {
        "title": title,
        "creator": creator,
        "paragraphs": paragraphs,
        "text": "\n".join(p["text"] for p in paragraphs),
        "n_entries": len(entries),
    }


_ODT_TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODT_OFFICE_NS = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"


def extract_odt(data: bytes) -> dict:
    """ODT (OpenDocument text) bytes -> {title, creator, paragraphs:
    [{style, text}], text, n_entries}.

    ``content.xml``'s office:text children: text:h headings and text:p
    paragraphs (style from text:style-name), with text:span runs
    flattened, text:line-break -> newline, text:tab -> tab, and
    text:s (run-length-encoded spaces, text:c count) expanded —
    the OpenDocument whitespace model a naive itertext() walk loses."""
    entries = {e["name"]: e["data"] for e in parse_zip(data)}
    content = entries.get("content.xml")
    if content is None:
        raise ValueError("ODT without content.xml")
    root = ET.fromstring(content)
    body = root.find(
        f"{{{_ODT_OFFICE_NS}}}body/{{{_ODT_OFFICE_NS}}}text"
    )
    if body is None:
        raise ValueError("ODT content.xml without office:body/office:text")

    def flatten(el) -> str:
        parts = [el.text or ""]
        for child in el:
            tag = child.tag
            if tag == f"{{{_ODT_TEXT_NS}}}line-break":
                parts.append("\n")
            elif tag == f"{{{_ODT_TEXT_NS}}}tab":
                parts.append("\t")
            elif tag == f"{{{_ODT_TEXT_NS}}}s":
                n = int(child.attrib.get(f"{{{_ODT_TEXT_NS}}}c", "1"))
                parts.append(" " * n)
            else:
                parts.append(flatten(child))
            parts.append(child.tail or "")
        return "".join(parts)

    paragraphs = []
    for el in body:
        tag = el.tag
        if tag in (f"{{{_ODT_TEXT_NS}}}p", f"{{{_ODT_TEXT_NS}}}h"):
            paragraphs.append(
                {
                    "style": el.attrib.get(
                        f"{{{_ODT_TEXT_NS}}}style-name"
                    ),
                    "text": flatten(el),
                }
            )
    title = creator = None
    meta = entries.get("meta.xml")
    if meta is not None:
        mroot = ET.fromstring(meta)
        t = mroot.find(f".//{{{_DC_NS}}}title")
        c = mroot.find(f".//{{{_DC_NS}}}creator")
        title = t.text if t is not None else None
        creator = c.text if c is not None else None
    return {
        "title": title,
        "creator": creator,
        "paragraphs": paragraphs,
        "text": "\n".join(p["text"] for p in paragraphs),
        "n_entries": len(entries),
    }


def make_odt(
    title: str,
    creator: str,
    paragraphs: list[tuple[str | None, list]],
) -> bytes:
    """Deterministic ODT: ``paragraphs`` = [(style or None, parts)];
    a part is a str, None for a line-break, "\t" for a tab, or an int
    N for a run of N spaces (the text:s form)."""
    from pyiceberg_lakehouse_spark.operators.archives import make_zip

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    body = []
    for style, parts in paragraphs:
        attr = f' text:style-name="{style}"' if style else ""
        inner = []
        for p in parts:
            if p is None:
                inner.append("<text:line-break/>")
            elif p == "\t":
                inner.append("<text:tab/>")
            elif isinstance(p, int):
                inner.append(f'<text:s text:c="{p}"/>')
            else:
                inner.append(esc(p))
        body.append(f"<text:p{attr}>{''.join(inner)}</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_ODT_OFFICE_NS}" '
        f'xmlns:text="{_ODT_TEXT_NS}">'
        f"<office:body><office:text>{''.join(body)}</office:text>"
        "</office:body></office:document-content>"
    )
    meta = (
        '<?xml version="1.0"?>'
        f'<office:document-meta xmlns:office="{_ODT_OFFICE_NS}" '
        f'xmlns:dc="{_DC_NS}"><office:meta>'
        f"<dc:title>{esc(title)}</dc:title>"
        f"<dc:creator>{esc(creator)}</dc:creator>"
        "</office:meta></office:document-meta>"
    )
    entries = [
        {
            "name": "mimetype",
            "data": b"application/vnd.oasis.opendocument.text",
        },
        {"name": "content.xml", "data": content.encode()},
        {"name": "meta.xml", "data": meta.encode()},
    ]
    return make_zip(entries, method=8)


# ------------------------------------------------------------- writers ---


def make_epub(
    title: str,
    creator: str,
    language: str,
    chapters: list[tuple[str, list[str]]],
    shuffle_zip_order: bool = False,
    streaming_zip: bool = False,
) -> bytes:
    """Deterministic EPUB: ``chapters`` = [(chapter title, paragraph
    list)]. ``shuffle_zip_order`` stores chapter files in REVERSED zip
    order while the spine keeps reading order — the spine must win."""
    from pyiceberg_lakehouse_spark.operators.archives import make_zip

    items = []
    spine = []
    files = []
    for i, (ctitle, paras) in enumerate(chapters):
        href = f"ch{i}.xhtml"
        body = "".join(f"<p>{p}</p>" for p in paras)
        xhtml = (
            '<?xml version="1.0" encoding="utf-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            f"<title>{ctitle}</title></head><body>"
            f"<h1>{ctitle}</h1>{body}</body></html>"
        )
        items.append(
            f'<item id="c{i}" href="{href}" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="c{i}"/>')
        files.append(
            {"name": f"OEBPS/{href}", "data": xhtml.encode("utf-8")}
        )
    opf = (
        '<?xml version="1.0"?>'
        f'<package xmlns="{_OPF_NS}" version="3.0" unique-identifier="u">'
        f'<metadata xmlns:dc="{_DC_NS}">'
        f"<dc:title>{title}</dc:title>"
        f"<dc:creator>{creator}</dc:creator>"
        f"<dc:language>{language}</dc:language>"
        "</metadata>"
        f'<manifest>{"".join(items)}</manifest>'
        f'<spine>{"".join(spine)}</spine></package>'
    )
    container = (
        '<?xml version="1.0"?>'
        f'<container version="1.0" xmlns="{_CONTAINER_NS}">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    if shuffle_zip_order:
        files = files[::-1]
    entries = [
        {"name": "mimetype", "data": b"application/epub+zip"},
        {"name": "META-INF/container.xml", "data": container.encode()},
        {"name": "OEBPS/content.opf", "data": opf.encode()},
        *files,
    ]
    return make_zip(entries, method=8, streaming=streaming_zip)


def make_docx(
    title: str,
    creator: str,
    paragraphs: list[tuple[str | None, list[str]]],
) -> bytes:
    """Deterministic DOCX: ``paragraphs`` = [(style or None, run
    texts)]; a ``None`` entry inside the run list becomes a <w:br/>,
    a ``"\\t"`` a <w:tab/>."""
    from pyiceberg_lakehouse_spark.operators.archives import make_zip

    body = []
    for style, runs in paragraphs:
        ppr = (
            f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
        )
        rxml = []
        for r in runs:
            if r is None:
                rxml.append("<w:r><w:br/></w:r>")
            elif r == "\t":
                rxml.append("<w:r><w:tab/></w:r>")
            else:
                esc = (
                    r.replace("&", "&amp;").replace("<", "&lt;")
                    .replace(">", "&gt;")
                )
                rxml.append(
                    f'<w:r><w:t xml:space="preserve">{esc}</w:t></w:r>'
                )
        body.append(f"<w:p>{ppr}{''.join(rxml)}</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{"".join(body)}'
        "</w:body></w:document>"
    )
    core = (
        '<?xml version="1.0"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/'
        'package/2006/metadata/core-properties" '
        f'xmlns:dc="{_DC_NS}">'
        f"<dc:title>{title}</dc:title>"
        f"<dc:creator>{creator}</dc:creator></cp:coreProperties>"
    )
    entries = [
        {
            "name": "[Content_Types].xml",
            "data": b'<?xml version="1.0"?><Types xmlns="http://schemas.'
            b'openxmlformats.org/package/2006/content-types"/>',
        },
        {"name": "word/document.xml", "data": doc.encode()},
        {"name": "docProps/core.xml", "data": core.encode()},
    ]
    return make_zip(entries, method=8)
