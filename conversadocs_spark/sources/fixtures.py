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
