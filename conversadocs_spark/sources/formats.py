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
fallback. The two legacy OLE compound formats (``.doc``, ``.ppt``)
get a minimal [MS-CFB] compound-file reader plus the [MS-DOC] piece
table / [MS-PPT] text-atom walks — real text extraction for
well-formed files; malformed bytes raise ``ParseError`` and degrade
to the kernel's marked placeholder row like every other format.

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
    """Format has no in-container parser. No built-in parser raises
    this anymore (the legacy OLE formats grew a real CFB reader);
    kept for production kernels that register partial parsers."""


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
# legacy OLE formats (.doc / .ppt) — stdlib CFB reader (MS-CFB spec)
# --------------------------------------------------------------------------

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


def _u16(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 2], "little")


def _u32(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 4], "little")


def _cfb_streams(data: bytes) -> dict[str, bytes]:
    """Parse an OLE2/CFB compound file into {stream name: bytes}.

    Implements the public [MS-CFB] layout: header DIFAT -> FAT ->
    directory chain; streams below the mini cutoff (4096) resolve
    through the mini FAT inside the root entry's mini stream. Names
    are flattened (storage tree ignored) — Word/PowerPoint text
    streams live at the root level. Total: everything parse_doc /
    parse_ppt need, nothing more.
    """
    if len(data) < 512 or data[:8] != _CFB_SIG:
        raise ParseError("not an OLE2 compound file")
    sec_shift = _u16(data, 30)
    mini_shift = _u16(data, 32)
    if not 6 <= sec_shift <= 12 or mini_shift >= sec_shift:
        raise ParseError("implausible CFB sector shifts")
    ssz, msz = 1 << sec_shift, 1 << mini_shift
    n_fat = _u32(data, 44)
    dir_start = _u32(data, 48)
    mini_cutoff = _u32(data, 56)
    minifat_start = _u32(data, 60)
    difat_start = _u32(data, 68)

    def sector(i: int) -> bytes:
        off = (i + 1) * ssz
        if off + ssz > len(data):
            raise ParseError(f"sector {i} beyond EOF")
        return data[off : off + ssz]

    def uint32s(b: bytes) -> list[int]:
        return [_u32(b, o) for o in range(0, len(b), 4)]

    difat = uint32s(data[76:512])
    nxt, guard = difat_start, 0
    while nxt not in (_ENDOFCHAIN, _FREESECT):
        s = uint32s(sector(nxt))
        difat += s[:-1]
        nxt = s[-1]
        guard += 1
        if guard > 4096:
            raise ParseError("DIFAT chain loop")
    fat: list[int] = []
    for fi in [s for s in difat if s != _FREESECT][:n_fat]:
        fat += uint32s(sector(fi))

    def chain(start: int, limit: int = 1 << 22) -> bytes:
        out, cur, seen = [], start, 0
        while cur not in (_ENDOFCHAIN, _FREESECT):
            if cur >= len(fat) or seen * ssz > limit:
                raise ParseError("broken FAT chain")
            out.append(sector(cur))
            cur = fat[cur]
            seen += 1
        return b"".join(out)

    directory = chain(dir_start)
    entries = []  # (name, type, start, size)
    for off in range(0, len(directory), 128):
        e = directory[off : off + 128]
        if len(e) < 128:
            break
        nlen = _u16(e, 64)
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", errors="replace")
        entries.append((name, e[66], _u32(e, 116), _u32(e, 120)))

    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise ParseError("CFB missing root entry")
    ministream = chain(root[2])[: root[3]] if root[3] else b""
    minifat = uint32s(chain(minifat_start)) if root[3] else []

    def mini_chain(start: int, size: int) -> bytes:
        out, cur, seen = [], start, 0
        while cur not in (_ENDOFCHAIN, _FREESECT):
            if cur >= len(minifat) or seen * msz > len(ministream):
                raise ParseError("broken miniFAT chain")
            out.append(ministream[cur * msz : cur * msz + msz])
            cur = minifat[cur]
            seen += 1
        return b"".join(out)[:size]

    streams: dict[str, bytes] = {}
    for name, typ, start, size in entries:
        if typ != 2:  # stream objects only
            continue
        if size < mini_cutoff:
            streams[name] = mini_chain(start, size)
        else:
            streams[name] = chain(start)[:size]
    return streams


def parse_doc(data: bytes) -> list[tuple[int | None, str]]:
    """Word 97-2003 binary ``.doc``: text lives in the WordDocument
    stream, addressed by the piece table (Clx/PlcPcd) stored in the
    0Table/1Table stream — offsets per the public [MS-DOC] spec
    (FibRgFcLcb97.fcClx at 0x1A2; PCD.fc bit 30 selects 8-bit vs
    UTF-16 pieces). Reference dispatch analog:
    /root/reference/conversadocs/bones.py:39 (.doc ->
    UnstructuredWordDocumentLoader)."""
    all_streams = _cfb_streams(data)
    wd = all_streams.get("WordDocument")
    if wd is None or len(wd) < 0x200:
        raise ParseError("no WordDocument stream")
    if _u16(wd, 0) != 0xA5EC:
        raise ParseError("bad FIB magic")
    table_name = "1Table" if _u16(wd, 0x000A) & 0x0200 else "0Table"
    table = all_streams.get(table_name)
    if table is None:
        raise ParseError(f"missing {table_name} stream")
    fc_clx, lcb_clx = _u32(wd, 0x01A2), _u32(wd, 0x01A6)
    clx = table[fc_clx : fc_clx + lcb_clx]
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # skip Prc property runs
        pos += 3 + _u16(clx, pos + 1)
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ParseError("piece table (Pcdt) not found in Clx")
    lcb = _u32(clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    n = (len(plc) - 4) // 12
    if n <= 0:
        raise ParseError("empty piece table")
    cps = [_u32(plc, 4 * i) for i in range(n + 1)]
    pieces: list[str] = []
    for i in range(n):
        pcd = plc[4 * (n + 1) + 8 * i :][:8]
        fc_raw = _u32(pcd, 2)
        n_cp = cps[i + 1] - cps[i]
        if fc_raw & 0x40000000:  # fCompressed: 8-bit cp1252 text
            off = (fc_raw & 0x3FFFFFFF) >> 1
            pieces.append(wd[off : off + n_cp].decode("cp1252"))
        else:
            off = fc_raw & 0x3FFFFFFF
            pieces.append(
                wd[off : off + 2 * n_cp].decode("utf-16-le", "replace")
            )
    text = "".join(pieces)
    # Word control characters: \r = paragraph mark, \x07 = cell mark,
    # \x0b = soft break; strip the rest of C0.
    text = re.sub(r"[\r\x07\x0b\x0c\x0e]", "\n", text)
    text = re.sub(r"[\x00-\x08\x0e-\x1f]", "", text)
    return [(None, _clean(text))]


#: PowerPoint 97 text atoms ([MS-PPT]): TextCharsAtom (UTF-16LE),
#: TextBytesAtom (8-bit), CString used for headers/footers.
_PPT_TEXTCHARS, _PPT_TEXTBYTES = 0x0FA0, 0x0FA8


def parse_ppt(data: bytes) -> list[tuple[int | None, str]]:
    """PowerPoint 97-2003 binary ``.ppt``: walk the record tree of the
    "PowerPoint Document" stream (8-byte headers: verInstance, type,
    len; recVer 0xF = container) collecting TextCharsAtom /
    TextBytesAtom payloads in document order. Slide boundaries need
    the SlideListWithText persist mapping, so the extraction is one
    combined row (page None) — same shape as parse_docx. Reference
    dispatch analog: /root/reference/conversadocs/bones.py:42."""
    stream = _cfb_streams(data).get("PowerPoint Document")
    if stream is None:
        raise ParseError("no PowerPoint Document stream")
    texts: list[str] = []

    def walk(buf: bytes, depth: int) -> None:
        if depth > 32:
            raise ParseError("record tree too deep")
        off = 0
        while off + 8 <= len(buf):
            ver = _u16(buf, off) & 0x000F
            rtype = _u16(buf, off + 2)
            rlen = _u32(buf, off + 4)
            payload = buf[off + 8 : off + 8 + rlen]
            if ver == 0xF:
                walk(payload, depth + 1)
            elif rtype == _PPT_TEXTCHARS:
                texts.append(payload.decode("utf-16-le", "replace"))
            elif rtype == _PPT_TEXTBYTES:
                texts.append(payload.decode("cp1252"))
            off += 8 + rlen
    walk(stream, 0)
    if not texts:
        raise ParseError("no text atoms in PowerPoint Document stream")
    return [(None, _clean("\n".join(texts)))]


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
    ".doc": parse_doc,
    ".ppt": parse_ppt,
}
