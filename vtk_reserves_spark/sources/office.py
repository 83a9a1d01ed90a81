"""Office-document text extraction (DOCX / PPTX / ODT / EPUB) — pure
stdlib (zipfile + xml.etree).

After HTML and PDF, zip-packaged office documents are the next most
common document payloads in web crawls (OOXML ECMA-376: .docx/.pptx;
OASIS ODF 1.2: .odt; IDPF EPUB: .epub — all are zip containers of
XML).  This module parses the container + XML part graph and reduces
each document to ordered text PARTS for curation: not a renderer, a
text miner.  Reference parity note: the reference repo has no office
surface at all (its only zip+xml reader is the xlsx loader we already
ship in `sources/xlsx.py`); this exists for the 100 TB curation brief.

Supported surface (long tail is explicit-error, never silent garbage):

* **DOCX** (ECMA-376 WordprocessingML): `word/document.xml` paragraph
  walk — `w:p` in document order; within a paragraph `w:t` text runs,
  `w:tab` -> TAB, `w:br`/`w:cr` -> newline; one part per paragraph.
  Title from `docProps/core.xml` `dc:title`.
* **PPTX** (ECMA-376 PresentationML): `ppt/slides/slideN.xml` in
  numeric order; per slide all `a:p` paragraphs (their `a:t` runs
  concatenated) joined by newline; one part per slide.  Title from
  `docProps/core.xml`.
* **ODT** (ODF `application/vnd.oasis.opendocument.text`):
  `content.xml` `office:body/office:text` children `text:p`/`text:h`
  in order, `text:tab`/`text:line-break` expanded; one part per
  paragraph.  Title from `meta.xml` `dc:title`.
* **EPUB** (`application/epub+zip`): `META-INF/container.xml` ->
  rootfile OPF -> manifest id->href + spine itemref order -> each
  XHTML chapter's `<body>` text (tags stripped, entities decoded,
  with a regex fallback for non-well-formed chapters); one part per
  spine document.  Title from OPF `dc:title`.
* kind sniffing from the zip member list alone (`word/document.xml`,
  `ppt/presentation.xml`, the ODF/EPUB `mimetype` member) — crawls
  rarely preserve extensions;
* fixture writers (`write_docx` / `write_pptx` / `write_odt` /
  `write_epub`) emitting minimal valid containers (stored OR
  deflated members) so round-trip tests cover each reader path.

Out of scope (raise explicitly): legacy binary .doc/.ppt (MS-CFB word
binary is a different era; BIFF8 .xls IS covered in `sources/xls.py`),
password-protected OOXML (CFB-wrapped ECMA-376 encryption), and
embedded media (never needed for text).

Scale shape: one document = one payload cell decoded executor-side
inside an Arrow batch (`operators/multimodal.office_text`); bytes
never hit the driver, mirroring the PDF and image codecs.
"""

from __future__ import annotations

import io
import re
import zipfile
from html import unescape
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

__all__ = [
    "OfficeError",
    "parse_office",
    "write_docx",
    "write_pptx",
    "write_odt",
    "write_epub",
]


class OfficeError(ValueError):
    pass


# -- namespaces ---------------------------------------------------------

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_CP = "http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
_DC = "http://purl.org/dc/elements/1.1/"
_ODF_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_ODF_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_CONTAINER = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF = "http://www.idpf.org/2007/opf"

_EPUB_MIME = "application/epub+zip"
_ODT_MIME = "application/vnd.oasis.opendocument.text"


def _zip_open(payload: bytes) -> zipfile.ZipFile:
    if not payload[:4] == b"PK\x03\x04":
        if payload[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
            raise OfficeError(
                "CFB container: legacy binary .doc/.ppt or encrypted OOXML "
                "is not supported (xls IS: sources/xls.py)"
            )
        raise OfficeError("not a zip container (no PK local-file header)")
    try:
        return zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise OfficeError(f"corrupt zip container: {exc}") from exc


def _xml(zf: zipfile.ZipFile, name: str) -> ET.Element:
    try:
        data = zf.read(name)
    except KeyError as exc:
        raise OfficeError(f"missing required member {name!r}") from exc
    try:
        return ET.fromstring(data)
    except ET.ParseError as exc:
        raise OfficeError(f"malformed XML in {name!r}: {exc}") from exc


def _core_title(zf: zipfile.ZipFile) -> str | None:
    """OPC core-properties title (shared by DOCX and PPTX)."""
    if "docProps/core.xml" not in zf.namelist():
        return None
    el = _xml(zf, "docProps/core.xml").find(f"{{{_DC}}}title")
    return el.text if el is not None else None


# -- DOCX ---------------------------------------------------------------

def _docx_paragraph_text(p: ET.Element) -> str:
    """w:t runs + w:tab/w:br/w:cr expansion, document order."""
    out: list[str] = []
    for el in p.iter():
        tag = el.tag
        if tag == f"{{{_W}}}t":
            out.append(el.text or "")
        elif tag == f"{{{_W}}}tab":
            out.append("\t")
        elif tag in (f"{{{_W}}}br", f"{{{_W}}}cr"):
            out.append("\n")
    return "".join(out)


def _parse_docx(zf: zipfile.ZipFile) -> dict:
    root = _xml(zf, "word/document.xml")
    body = root.find(f"{{{_W}}}body")
    if body is None:
        raise OfficeError("word/document.xml has no w:body")
    parts = [
        _docx_paragraph_text(p) for p in body.iter(f"{{{_W}}}p")
    ]
    return {"kind": "docx", "parts": parts, "title": _core_title(zf)}


# -- PPTX ---------------------------------------------------------------

_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def _parse_pptx(zf: zipfile.ZipFile) -> dict:
    slides = sorted(
        ((int(m.group(1)), n) for n in zf.namelist() if (m := _SLIDE_RE.match(n))),
    )
    parts: list[str] = []
    for _, name in slides:
        root = _xml(zf, name)
        paras = [
            "".join(t.text or "" for t in p.iter(f"{{{_A}}}t"))
            for p in root.iter(f"{{{_A}}}p")
        ]
        parts.append("\n".join(paras))
    return {"kind": "pptx", "parts": parts, "title": _core_title(zf)}


# -- ODT ----------------------------------------------------------------

def _odt_paragraph_text(p: ET.Element) -> str:
    """Paragraph text with text:tab / text:line-break expansion (ODF
    collapses literal whitespace; structural whitespace is elements)."""
    out: list[str] = [p.text or ""]
    for el in p:
        tag = el.tag
        if tag == f"{{{_ODF_TEXT}}}tab":
            out.append("\t")
        elif tag == f"{{{_ODF_TEXT}}}line-break":
            out.append("\n")
        else:
            out.append("".join(el.itertext()))
        out.append(el.tail or "")
    return "".join(out)


def _parse_odt(zf: zipfile.ZipFile) -> dict:
    root = _xml(zf, "content.xml")
    text_el = root.find(f"{{{_ODF_OFFICE}}}body/{{{_ODF_OFFICE}}}text")
    if text_el is None:
        raise OfficeError("content.xml has no office:body/office:text")
    parts = [
        _odt_paragraph_text(p)
        for p in text_el
        if p.tag in (f"{{{_ODF_TEXT}}}p", f"{{{_ODF_TEXT}}}h")
    ]
    title = None
    if "meta.xml" in zf.namelist():
        el = _xml(zf, "meta.xml").find(f".//{{{_DC}}}title")
        title = el.text if el is not None else None
    return {"kind": "odt", "parts": parts, "title": title}


# -- EPUB ---------------------------------------------------------------

_TAG_RE = re.compile(r"<[^>]*>")
_DROP_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.S | re.I)


def _xhtml_body_text(data: bytes) -> str:
    """Chapter text: ET body itertext when well-formed, regex strip
    fallback otherwise (wild EPUB chapters are often HTML, not XHTML)."""
    try:
        root = ET.fromstring(data)
        body = next(
            (el for el in root.iter() if el.tag.rsplit("}", 1)[-1] == "body"),
            root,
        )
        return "".join(body.itertext())
    except ET.ParseError:
        text = data.decode("utf-8", "replace")
        m = re.search(r"<body[^>]*>(.*?)</body\s*>", text, re.S | re.I)
        if m:
            text = m.group(1)
        return unescape(_TAG_RE.sub("", _DROP_RE.sub("", text)))


def _parse_epub(zf: zipfile.ZipFile) -> dict:
    container = _xml(zf, "META-INF/container.xml")
    rootfile = container.find(
        f".//{{{_CONTAINER}}}rootfile[@media-type='application/oebps-package+xml']"
    )
    if rootfile is None:
        raise OfficeError("container.xml names no OPF rootfile")
    opf_path = rootfile.get("full-path", "")
    opf = _xml(zf, opf_path)
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""

    hrefs = {
        item.get("id"): item.get("href")
        for item in opf.iter(f"{{{_OPF}}}item")
    }
    parts: list[str] = []
    for ref in opf.iter(f"{{{_OPF}}}itemref"):
        href = hrefs.get(ref.get("idref"))
        if href is None:
            raise OfficeError(f"spine idref {ref.get('idref')!r} not in manifest")
        parts.append(_xhtml_body_text(zf.read(base + href)))
    title_el = opf.find(f".//{{{_DC}}}title")
    title = title_el.text if title_el is not None else None
    return {"kind": "epub", "parts": parts, "title": title}


# -- dispatch -----------------------------------------------------------

def parse_office(payload: bytes) -> dict:
    """Parse a zip-packaged office document to
    ``{"kind", "parts": [str, ...], "title"}``.

    Kind is sniffed from the member list (crawled files rarely keep
    extensions): ``word/document.xml`` -> docx, ``ppt/presentation.xml``
    -> pptx, and the ODF/EPUB ``mimetype`` member for odt/epub.
    Unknown zips raise :class:`OfficeError`.
    """
    zf = _zip_open(bytes(payload))
    names = set(zf.namelist())
    if "word/document.xml" in names:
        return _parse_docx(zf)
    if "ppt/presentation.xml" in names:
        return _parse_pptx(zf)
    if "mimetype" in names:
        mime = zf.read("mimetype").decode("ascii", "replace").strip()
        if mime == _EPUB_MIME:
            return _parse_epub(zf)
        if mime == _ODT_MIME:
            return _parse_odt(zf)
        raise OfficeError(f"unsupported ODF/EPUB mimetype {mime!r}")
    if "content.xml" in names:  # mimetype-less ODF (seen in the wild)
        return _parse_odt(zf)
    raise OfficeError("zip is not a recognized office container")


# -- fixture writers ----------------------------------------------------

def _make_zip(members: list[tuple[str, bytes]], *, compress: bool,
              stored_first: bool = False) -> bytes:
    buf = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w") as zf:
        for i, (name, data) in enumerate(members):
            method = (
                zipfile.ZIP_STORED if (stored_first and i == 0) else comp
            )
            zf.writestr(zipfile.ZipInfo(name), data, compress_type=method)
    return buf.getvalue()


_CT_DOCX = (
    '<?xml version="1.0"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '<Override PartName="/docProps/core.xml" ContentType="application/vnd.'
    'openxmlformats-package.core-properties+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="{target}"/>'
    "</Relationships>"
)


def _core_xml(title: str | None) -> bytes:
    t = escape(title or "")
    return (
        '<?xml version="1.0"?>'
        f'<cp:coreProperties xmlns:cp="{_CP}" xmlns:dc="{_DC}">'
        f"<dc:title>{t}</dc:title></cp:coreProperties>"
    ).encode()


def write_docx(paragraphs: list[str], title: str | None = None,
               *, compress: bool = True) -> bytes:
    """Minimal valid DOCX: one w:p per input string (newlines inside a
    paragraph become w:br, tabs become w:tab — the inverse of the
    reader's expansion)."""
    body = []
    for p in paragraphs:
        runs = []
        for i, line in enumerate(p.split("\n")):
            if i:
                runs.append("<w:br/>")
            for j, seg in enumerate(line.split("\t")):
                if j:
                    runs.append("<w:tab/>")
                runs.append(f'<w:t xml:space="preserve">{escape(seg)}</w:t>')
        body.append(f"<w:p><w:r>{''.join(runs)}</w:r></w:p>")
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{_W}">'
        f"<w:body>{''.join(body)}</w:body></w:document>"
    ).encode()
    return _make_zip(
        [
            ("[Content_Types].xml", _CT_DOCX.encode()),
            ("_rels/.rels", _RELS.format(target="word/document.xml").encode()),
            ("word/document.xml", doc),
            ("docProps/core.xml", _core_xml(title)),
        ],
        compress=compress,
    )


_CT_PPTX = (
    '<?xml version="1.0"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
    '<Override PartName="/docProps/core.xml" ContentType="application/vnd.'
    'openxmlformats-package.core-properties+xml"/>'
    "</Types>"
)


def write_pptx(slides: list[str], title: str | None = None,
               *, compress: bool = True) -> bytes:
    """Minimal valid PPTX: one slide per input string; newlines inside
    a slide become separate a:p paragraphs."""
    members: list[tuple[str, bytes]] = [
        ("[Content_Types].xml", _CT_PPTX.encode()),
        ("_rels/.rels", _RELS.format(target="ppt/presentation.xml").encode()),
        (
            "ppt/presentation.xml",
            f'<?xml version="1.0"?><p:presentation xmlns:p='
            f'"http://schemas.openxmlformats.org/presentationml/2006/main"/>'
            .encode(),
        ),
        ("docProps/core.xml", _core_xml(title)),
    ]
    for i, slide in enumerate(slides, 1):
        paras = "".join(
            f"<a:p><a:r><a:t>{escape(line)}</a:t></a:r></a:p>"
            for line in slide.split("\n")
        )
        members.append(
            (
                f"ppt/slides/slide{i}.xml",
                (
                    f'<?xml version="1.0"?><p:sld xmlns:p='
                    f'"http://schemas.openxmlformats.org/presentationml/2006/main" '
                    f'xmlns:a="{_A}"><p:cSld><p:spTree><p:sp><p:txBody>'
                    f"{paras}</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
                ).encode(),
            )
        )
    return _make_zip(members, compress=compress)


def write_odt(paragraphs: list[str], title: str | None = None,
              *, compress: bool = True) -> bytes:
    """Minimal valid ODT: mimetype member first and STORED (per ODF
    packaging rules); one text:p per input string with tab/line-break
    elements for embedded whitespace."""
    body = []
    for p in paragraphs:
        seg = escape(p).replace("\t", f'<text:tab xmlns:text="{_ODF_TEXT}"/>')
        seg = seg.replace("\n", f'<text:line-break xmlns:text="{_ODF_TEXT}"/>')
        body.append(f"<text:p>{seg}</text:p>")
    content = (
        f'<?xml version="1.0"?><office:document-content '
        f'xmlns:office="{_ODF_OFFICE}" xmlns:text="{_ODF_TEXT}">'
        f"<office:body><office:text>{''.join(body)}</office:text>"
        f"</office:body></office:document-content>"
    ).encode()
    meta = (
        f'<?xml version="1.0"?><office:document-meta '
        f'xmlns:office="{_ODF_OFFICE}" xmlns:dc="{_DC}">'
        f"<office:meta><dc:title>{escape(title or '')}</dc:title>"
        f"</office:meta></office:document-meta>"
    ).encode()
    manifest = (
        '<?xml version="1.0"?><manifest:manifest xmlns:manifest='
        '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
        '<manifest:file-entry manifest:full-path="/" manifest:media-type='
        f'"{_ODT_MIME}"/></manifest:manifest>'
    ).encode()
    return _make_zip(
        [
            ("mimetype", _ODT_MIME.encode()),
            ("content.xml", content),
            ("meta.xml", meta),
            ("META-INF/manifest.xml", manifest),
        ],
        compress=compress,
        stored_first=True,
    )


def write_epub(chapters: list[str], title: str | None = None,
               *, compress: bool = True) -> bytes:
    """Minimal valid EPUB: mimetype member first and STORED (per OCF),
    container.xml -> OEBPS/content.opf, one XHTML chapter per input
    string in spine order."""
    container = (
        f'<?xml version="1.0"?><container version="1.0" xmlns="{_CONTAINER}">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    ).encode()
    manifest = "".join(
        f'<item id="c{i}" href="chap{i}.xhtml" media-type="application/xhtml+xml"/>'
        for i in range(1, len(chapters) + 1)
    )
    spine = "".join(
        f'<itemref idref="c{i}"/>' for i in range(1, len(chapters) + 1)
    )
    opf = (
        f'<?xml version="1.0"?><package xmlns="{_OPF}" version="3.0" '
        f'unique-identifier="id"><metadata xmlns:dc="{_DC}">'
        f"<dc:title>{escape(title or '')}</dc:title>"
        f'<dc:identifier id="id">fixture</dc:identifier></metadata>'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    ).encode()
    members: list[tuple[str, bytes]] = [
        ("mimetype", _EPUB_MIME.encode()),
        ("META-INF/container.xml", container),
        ("OEBPS/content.opf", opf),
    ]
    for i, ch in enumerate(chapters, 1):
        members.append(
            (
                f"OEBPS/chap{i}.xhtml",
                (
                    '<?xml version="1.0"?>'
                    '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
                    "<title/></head><body><p>"
                    + escape(ch)
                    + "</p></body></html>"
                ).encode(),
            )
        )
    return _make_zip(members, compress=compress, stored_first=True)
