"""Pure-stdlib document format parsers for the ingest kernel (R1).

The reference dispatches 11 extensions to LangChain loader classes
(/root/reference/conversadocs/bones.py:32-44). Those loaders wrap
heavyweight parser libraries that are not installed in this container —
but most of the "binary" formats are really zip-of-XML containers
(OOXML ``.docx``/``.pptx``, ODF ``.odt``, EPUB), ``.enex`` is plain
XML, and the common machine-generated PDF is object streams with
FlateDecode (zlib) text content. All of those are parseable with the
Python standard library alone, which is exactly what this module does:
every parser below reads REAL bytes with ``zipfile``/``zlib``/
``xml.etree``/``re`` and returns ``[(page, text), ...]``.

Upgrade path: if ``pypdf`` IS installed (production), ``parse_pdf``
delegates to it (import-guarded) and the stdlib extractor is the
fallback. Only the two legacy OLE compound formats (``.doc``,
``.ppt``) remain unimplemented — their piece-table/record parsing has
no reasonable stdlib shortcut; they raise ``UnsupportedFormatError``
and the ingest kernel emits its clearly-marked placeholder row.

Every parser is total: malformed bytes raise ``ParseError`` (never a
random stdlib exception) so the kernel can degrade to a placeholder
row instead of failing the Spark task.
"""

from __future__ import annotations

import io as _io
import re
import zipfile
import zlib
from xml.etree import ElementTree

try:  # pragma: no cover - not installed in this container
    import pypdf  # type: ignore

    _HAVE_PYPDF = True
except ImportError:
    pypdf = None
    _HAVE_PYPDF = False


class ParseError(Exception):
    """Input bytes are not a valid instance of the claimed format."""


class UnsupportedFormatError(ParseError):
    """Format has no in-container parser (legacy OLE .doc/.ppt)."""


_WS_RE = re.compile(r"\s+")
_TAG_RE = re.compile(r"<[^>]+>")

# OOXML / ODF namespaces (public ECMA-376 / OASIS ODF schemas).
_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_ODF_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def _clean(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def _open_zip(data: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(_io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ParseError(f"not a zip container: {e}") from e


def _read_xml(zf: zipfile.ZipFile, name: str) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(zf.read(name))
    except (KeyError, ElementTree.ParseError) as e:
        raise ParseError(f"bad or missing zip member {name}: {e}") from e


# --------------------------------------------------------------------------
# zip-of-XML formats
# --------------------------------------------------------------------------


def parse_docx(data: bytes) -> list[tuple[int | None, str]]:
    """OOXML WordprocessingML: word/document.xml, one string per
    ``w:p`` paragraph joined by newlines. Word has no static page
    breaks in the XML, so page is None (matches Docx2txtLoader)."""
    root = _read_xml(_open_zip(data), "word/document.xml")
    paras = []
    for p in root.iter(f"{_W}p"):
        runs = [t.text or "" for t in p.iter(f"{_W}t")]
        if runs:
            paras.append("".join(runs))
    return [(None, _clean("\n".join(paras)))]


def parse_pptx(data: bytes) -> list[tuple[int | None, str]]:
    """OOXML PresentationML: one row per slide (page = slide number),
    text from the ``a:t`` runs of each slide part."""
    zf = _open_zip(data)
    slide_re = re.compile(r"^ppt/slides/slide(\d+)\.xml$")
    slides = sorted(
        (int(m.group(1)), n)
        for n in zf.namelist()
        if (m := slide_re.match(n))
    )
    if not slides:
        raise ParseError("no ppt/slides/slide*.xml members")
    out = []
    for num, name in slides:
        root = _read_xml(zf, name)
        runs = [t.text or "" for t in root.iter(f"{_A}t")]
        out.append((num, _clean(" ".join(runs))))
    return out


def parse_odt(data: bytes) -> list[tuple[int | None, str]]:
    """OASIS ODF text: content.xml, text:h/text:p paragraphs."""
    root = _read_xml(_open_zip(data), "content.xml")
    paras = []
    for el in root.iter():
        if el.tag in (f"{_ODF_TEXT}p", f"{_ODF_TEXT}h"):
            paras.append(_clean("".join(el.itertext())))
    return [(None, _clean("\n".join(p for p in paras if p)))]


def parse_epub(data: bytes) -> list[tuple[int | None, str]]:
    """EPUB: zip of XHTML chapters; one row per chapter document in
    archive order (page = 1-based chapter index), tags stripped."""
    zf = _open_zip(data)
    chapters = [
        n
        for n in zf.namelist()
        if n.lower().endswith((".xhtml", ".html", ".htm"))
    ]
    if not chapters:
        raise ParseError("no XHTML chapters in epub container")
    out = []
    for i, name in enumerate(chapters, start=1):
        raw = zf.read(name).decode("utf-8", errors="replace")
        body = re.sub(
            r"<(script|style)\b.*?</\1>", " ", raw, flags=re.S | re.I
        )
        out.append((i, _clean(_TAG_RE.sub(" ", body))))
    return out


# --------------------------------------------------------------------------
# plain-XML format
# --------------------------------------------------------------------------


def parse_enex(data: bytes) -> list[tuple[int | None, str]]:
    """Evernote ENEX export: XML of <note> elements; content is ENML
    (XHTML-ish) inside CDATA — strip tags, one row per note."""
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise ParseError(f"bad enex xml: {e}") from e
    notes = root.findall(".//note")
    if not notes:
        raise ParseError("no <note> elements in enex")
    out = []
    for i, note in enumerate(notes, start=1):
        title = note.findtext("title") or ""
        enml = note.findtext("content") or ""
        body = _clean(_TAG_RE.sub(" ", enml))
        out.append((i, _clean(f"{title}\n{body}")))
    return out


# --------------------------------------------------------------------------
# PDF
# --------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
# (string) Tj / ' / "  — escaped chars allowed inside
_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*(?:Tj|'|\")")
# [ ... ] TJ — array of strings and kerning offsets
_TJARR_RE = re.compile(rb"\[((?:\\.|[^\]])*)\]\s*TJ")
_STR_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)")
_ESC_RE = re.compile(rb"\\([nrtbf()\\]|[0-7]{1,3})")
_ESC_MAP = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> bytes:
    def sub(m: re.Match[bytes]) -> bytes:
        g = m.group(1)
        if g in _ESC_MAP:
            return _ESC_MAP[g]
        return bytes([int(g, 8) & 0xFF])

    return _ESC_RE.sub(sub, raw)


def _content_text(stream: bytes) -> str:
    """Extract text-showing operator arguments from one decompressed
    content stream. Covers Tj, ', \", and TJ with literal strings —
    the output of the vast majority of text-PDF generators. Hex
    strings / CID-keyed fonts are out of scope for the stdlib
    fallback (pypdf handles them when installed)."""
    parts: list[bytes] = []
    for m in _TJ_RE.finditer(stream):
        parts.append(_unescape_pdf_string(m.group(1)))
    for m in _TJARR_RE.finditer(stream):
        arr = b"".join(
            _unescape_pdf_string(s.group(1))
            for s in _STR_RE.finditer(m.group(1))
        )
        parts.append(arr)
    return _clean(
        b" ".join(parts).decode("latin-1", errors="replace")
    )


def _decode_stream(body: bytes) -> bytes | None:
    sm = _STREAM_RE.search(body)
    if sm is None:
        return None
    raw = sm.group(1)
    if b"/FlateDecode" in body[: sm.start()]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def _pdf_pages_stdlib(data: bytes) -> list[tuple[int | None, str]]:
    """Minimal object-graph PDF text extractor (public PDF 1.7 spec,
    ISO 32000-1): split ``N 0 obj…endobj`` bodies, find /Type/Page
    objects, follow their /Contents references, FlateDecode, and pull
    the text-showing operators per page. Single-generation,
    non-encrypted, non-objstm files only — the honest 90% case; raise
    ParseError otherwise so the kernel degrades cleanly."""
    if not data.startswith(b"%PDF-"):
        raise ParseError("missing %PDF- header")
    if b"/Encrypt" in data:
        raise ParseError("encrypted pdf unsupported by stdlib parser")
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }
    pages: list[int] = []
    for num, body in sorted(objs.items()):
        head = body.split(b"stream", 1)[0]
        if re.search(rb"/Type\s*/Page\b(?!s)", head):
            pages.append(num)
    if not pages:
        raise ParseError("no /Type /Page objects found")
    out: list[tuple[int | None, str]] = []
    for i, num in enumerate(pages, start=1):
        head = objs[num].split(b"stream", 1)[0]
        cm = re.search(
            rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", head
        )
        text_parts = []
        if cm:
            for ref in _REF_RE.finditer(cm.group(1)):
                body = objs.get(int(ref.group(1)))
                if body is None:
                    continue
                stream = _decode_stream(body)
                if stream:
                    text_parts.append(_content_text(stream))
        out.append((i, _clean(" ".join(text_parts))))
    if not any(t for _, t in out):
        raise ParseError("no extractable text operators")
    return out


def parse_pdf(data: bytes) -> list[tuple[int | None, str]]:
    """One row per page. Uses pypdf when installed (production path,
    import-guarded above); otherwise the stdlib object-graph extractor.
    Mirrors PyPDFLoader's one-Document-per-page contract
    (/root/reference/conversadocs/bones.py:33, app.py:105-108)."""
    if _HAVE_PYPDF:  # pragma: no cover - pypdf absent in container
        try:
            reader = pypdf.PdfReader(_io.BytesIO(data))
            return [
                (i, _clean(page.extract_text() or ""))
                for i, page in enumerate(reader.pages, start=1)
            ]
        except Exception as e:  # noqa: BLE001 - degrade to stdlib
            raise ParseError(f"pypdf failed: {e}") from e
    return _pdf_pages_stdlib(data)


# --------------------------------------------------------------------------
# legacy OLE formats — no stdlib parser
# --------------------------------------------------------------------------


def parse_ole_legacy(data: bytes) -> list[tuple[int | None, str]]:
    """.doc/.ppt are OLE2 compound files whose text lives behind a
    piece table (Word) / record stream (PowerPoint); parsing them
    needs olefile+antiword-class logic with no stdlib shortcut.
    Raises so the kernel emits its marked placeholder row."""
    raise UnsupportedFormatError(
        "legacy OLE .doc/.ppt parsing requires olefile/textract; "
        "install and swap this kernel in production"
    )


# NOTE: no conversadocs_spark imports in this module — it is pickled
# BY VALUE into the ingest UDF closure (registered from ingest.py),
# and any same-package global would be pickled by reference and fail
# with ModuleNotFoundError on workers that lack the repo sys.path.

#: extension -> parser callable; the ingest kernel dispatches here.
PARSERS = {
    ".pdf": parse_pdf,
    ".docx": parse_docx,
    ".pptx": parse_pptx,
    ".odt": parse_odt,
    ".epub": parse_epub,
    ".enex": parse_enex,
    ".doc": parse_ole_legacy,
    ".ppt": parse_ole_legacy,
}
