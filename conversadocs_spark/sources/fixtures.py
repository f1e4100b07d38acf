"""Minimal document-format WRITERS (fixture/staging side of
``formats.py``). Each builds a small but spec-valid file with the
stdlib so ingest tests and the driver-visible scan query can exercise
the real parse kernels without any parser/writer library installed.

These are test-corpus builders, not a production document writer: one
text payload in, one well-formed container out (public ECMA-376 / ODF
/ EPUB / ENEX / PDF 1.7 structures, same as formats.py reads).
"""

from __future__ import annotations

import io
import zipfile
import zlib
from xml.sax.saxutils import escape

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_ODF_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"


def _zip_bytes(members: dict[str, str | bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def make_docx(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t>{escape(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{_W_NS}">'
        f"<w:body>{body}</w:body></w:document>"
    )
    return _zip_bytes(
        {"[Content_Types].xml": "<Types/>", "word/document.xml": doc}
    )


def make_pptx(slides: list[str]) -> bytes:
    members: dict[str, str | bytes] = {"[Content_Types].xml": "<Types/>"}
    for i, text in enumerate(slides, start=1):
        members[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0"?><p:sld '
            f'xmlns:p="urn:x-p" xmlns:a="{_A_NS}">'
            f"<a:t>{escape(text)}</a:t></p:sld>"
        )
    return _zip_bytes(members)


def make_odt(paragraphs: list[str]) -> bytes:
    body = "".join(f"<text:p>{escape(p)}</text:p>" for p in paragraphs)
    content = (
        f'<?xml version="1.0"?><office:document-content '
        f'xmlns:office="urn:x-o" xmlns:text="{_ODF_NS}">'
        f"<office:body>{body}</office:body></office:document-content>"
    )
    return _zip_bytes(
        {
            "mimetype": "application/vnd.oasis.opendocument.text",
            "content.xml": content,
        }
    )


def make_epub(chapters: list[str]) -> bytes:
    members: dict[str, str | bytes] = {
        "mimetype": "application/epub+zip",
        "META-INF/container.xml": "<container/>",
    }
    for i, text in enumerate(chapters, start=1):
        members[f"OPS/ch{i}.xhtml"] = (
            f"<html><body><h1>Chapter {i}</h1><p>{escape(text)}</p>"
            f"<script>ignore();</script></body></html>"
        )
    return _zip_bytes(members)


def make_enex(notes: list[tuple[str, str]]) -> bytes:
    body = "".join(
        f"<note><title>{escape(t)}</title>"
        f"<content><![CDATA[<en-note><div>{escape(c)}</div>"
        f"</en-note>]]></content></note>"
        for t, c in notes
    )
    return f'<?xml version="1.0"?><en-export>{body}</en-export>'.encode()


def _pdf_escape(text: str) -> str:
    """Escape the PDF literal-string specials and force latin-1-safe
    bytes (the writer targets the stdlib reader's supported subset)."""
    safe = text.encode("latin-1", errors="replace").decode("latin-1")
    return (
        safe.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    )


def make_pdf(pages: list[str]) -> bytes:
    """Minimal valid PDF 1.4: catalog -> pages -> page objects, each
    page with a FlateDecode content stream of Tj/TJ text operators."""
    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, text in enumerate(pages):
        content_obj = 4 + 2 * i
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_obj} 0 R >>".encode()
        )
        words = _pdf_escape(text).split(" ")
        half = max(1, len(words) // 2)
        part1, part2 = " ".join(words[:half]), " ".join(words[half:])
        stream = zlib.compress(
            f"BT /F1 12 Tf 72 720 Td ({part1}) Tj "
            f"[({part2})] TJ ET".encode("latin-1")
        )
        objs.append(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n" + stream + b"\nendstream"
        )
    out = [b"%PDF-1.4"]
    for num, body in enumerate(objs, start=1):
        out.append(f"{num} 0 obj ".encode() + body + b" endobj")
    out.append(b"trailer << /Root 1 0 R >>\n%%EOF")
    return b"\n".join(out)


# --------------------------------------------------------------------------
# legacy OLE (.doc / .ppt) builders — minimal [MS-CFB] compound files
# --------------------------------------------------------------------------

_CFB_ENDOFCHAIN = 0xFFFFFFFE
_CFB_FREESECT = 0xFFFFFFFF
_CFB_FATSECT = 0xFFFFFFFD
_CFB_NOSTREAM = 0xFFFFFFFF


def _u16b(v: int) -> bytes:
    return v.to_bytes(2, "little")


def _u32b(v: int) -> bytes:
    return v.to_bytes(4, "little")


def make_cfb(streams: dict[str, bytes]) -> bytes:
    """Write a spec-valid v3 CFB compound file (512-byte sectors,
    64-byte mini sectors, 4096 mini cutoff): header DIFAT -> one FAT
    sector -> directory; streams below the cutoff live in the root
    entry's mini stream via the mini FAT — so reading these fixtures
    exercises BOTH allocation paths of formats._cfb_streams. Capacity
    is one FAT sector (128 sectors / 64 KiB), plenty for fixtures and
    asserted explicitly."""
    SS, MS, CUTOFF = 512, 64, 4096
    sectors: list[bytes] = []
    fat: list[int] = []

    def alloc(data: bytes) -> int:
        start = len(sectors)
        n = max(1, -(-len(data) // SS))
        for i in range(n):
            sectors.append(data[i * SS : (i + 1) * SS].ljust(SS, b"\0"))
            fat.append(start + i + 1)
        fat[-1] = _CFB_ENDOFCHAIN
        return start

    # mini stream: concat small streams at 64-byte granularity
    mini_data = bytearray()
    minifat: list[int] = []
    starts: dict[str, int] = {}
    for name, data in streams.items():
        if len(data) >= CUTOFF:
            continue
        first = len(minifat)
        n = max(1, -(-len(data) // MS))
        padded = data.ljust(n * MS, b"\0")
        mini_data += padded
        minifat += list(range(first + 1, first + n))
        minifat.append(_CFB_ENDOFCHAIN)
        starts[name] = first
    for name, data in streams.items():
        if len(data) >= CUTOFF:
            starts[name] = alloc(data)
    mini_start = alloc(bytes(mini_data)) if mini_data else _CFB_ENDOFCHAIN
    if minifat:
        minifat_bytes = b"".join(_u32b(v) for v in minifat)
        minifat_start = alloc(minifat_bytes)
        n_minifat_sectors = -(-len(minifat_bytes) // SS)
    else:
        minifat_start, n_minifat_sectors = _CFB_ENDOFCHAIN, 0

    def dirent(
        name: str, typ: int, start: int, size: int, child: int
    ) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[0 : len(raw)] = raw
        e[64:66] = _u16b(len(raw) + 2)
        e[66] = typ
        e[67] = 1  # black
        e[68:72] = _u32b(_CFB_NOSTREAM)  # left sibling
        e[76:80] = _u32b(child)
        e[116:120] = _u32b(start)
        e[120:124] = _u32b(size)
        return bytes(e)

    names = list(streams)
    entries = [
        dirent(
            "Root Entry",
            5,
            mini_start,
            len(mini_data),
            1 if names else _CFB_NOSTREAM,
        )
    ]
    for i, name in enumerate(names):
        e = bytearray(
            dirent(name, 2, starts[name], len(streams[name]),
                   _CFB_NOSTREAM)
        )
        nxt = i + 2 if i + 1 < len(names) else _CFB_NOSTREAM
        e[72:76] = _u32b(nxt)  # right sibling: flat chain
        entries.append(bytes(e))
    dir_start = alloc(b"".join(entries))

    fat_start = len(sectors)
    fat.append(_CFB_FATSECT)
    assert len(fat) <= SS // 4, "fixture exceeds one FAT sector"
    fat += [_CFB_FREESECT] * (SS // 4 - len(fat))
    sectors.append(b"".join(_u32b(v) for v in fat))

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    header[24:26] = _u16b(0x003E)  # minor version
    header[26:28] = _u16b(3)  # major version 3 (512B sectors)
    header[28:30] = _u16b(0xFFFE)  # little-endian marker
    header[30:32] = _u16b(9)  # sector shift
    header[32:34] = _u16b(6)  # mini sector shift
    header[44:48] = _u32b(1)  # one FAT sector
    header[48:52] = _u32b(dir_start)
    header[56:60] = _u32b(CUTOFF)
    header[60:64] = _u32b(minifat_start)
    header[64:68] = _u32b(n_minifat_sectors)
    header[68:72] = _u32b(_CFB_ENDOFCHAIN)  # no DIFAT chain
    difat = [fat_start] + [_CFB_FREESECT] * 108
    header[76:512] = b"".join(_u32b(v) for v in difat)
    return bytes(header) + b"".join(sectors)


def make_doc(paragraphs: list[str]) -> bytes:
    """Word 97 binary .doc: WordDocument stream (FIB + raw text) and a
    0Table stream holding the Clx piece table. The text is split into
    one fCompressed (cp1252) piece and one UTF-16 piece so the reader
    exercises both [MS-DOC] PCD encodings."""
    text = "\r".join(paragraphs) + "\r"
    half = len(text) // 2
    a, b = text[:half], text[half:]
    a_bytes = a.encode("cp1252")
    b_bytes = b.encode("utf-16-le")
    wd = bytearray(1024)  # FIB zone
    wd[0:2] = _u16b(0xA5EC)  # wIdent
    wd[2:4] = _u16b(0x00C1)  # nFib (Word 97)
    wd[0x0A:0x0C] = _u16b(0)  # fWhichTblStm=0 -> 0Table
    a_off = len(wd)
    wd += a_bytes
    b_off = len(wd)
    wd += b_bytes
    cps = [0, len(a), len(a) + len(b)]
    pcd_a = _u16b(0) + _u32b((a_off * 2) | 0x40000000) + _u16b(0)
    pcd_b = _u16b(0) + _u32b(b_off) + _u16b(0)
    plc = b"".join(_u32b(cp) for cp in cps) + pcd_a + pcd_b
    clx = b"\x02" + _u32b(len(plc)) + plc
    wd[0x01A2:0x01A6] = _u32b(0)  # fcClx: Clx at start of 0Table
    wd[0x01A6:0x01AA] = _u32b(len(clx))  # lcbClx
    return make_cfb({"WordDocument": bytes(wd), "0Table": clx})


def make_ppt(texts: list[str]) -> bytes:
    """PowerPoint 97 binary .ppt: a "PowerPoint Document" stream whose
    record tree nests TextCharsAtom (UTF-16) / TextBytesAtom (cp1252)
    atoms inside a container record, alternating so the reader
    exercises both [MS-PPT] text encodings."""

    def rec(ver: int, rtype: int, payload: bytes) -> bytes:
        return _u16b(ver) + _u16b(rtype) + _u32b(len(payload)) + payload

    atoms = b""
    for i, t in enumerate(texts):
        if i % 2 == 0:
            atoms += rec(0x0000, 0x0FA0, t.encode("utf-16-le"))
        else:
            atoms += rec(0x0000, 0x0FA8, t.encode("cp1252"))
    document = rec(0x000F, 0x03E8, atoms)  # DocumentContainer
    return make_cfb({"PowerPoint Document": document})
