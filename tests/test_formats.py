"""Format parser tests: build real docx/pptx/odt/epub/enex/pdf bytes
with the stdlib (the same container specs the parsers read — public
ECMA-376 / ODF / EPUB / PDF 1.7 formats) and round-trip them through
the parse kernels and the Spark ingest scan."""

from __future__ import annotations

import os
import zlib

import pytest

from conversadocs_spark.sources import formats
from conversadocs_spark.sources.fixtures import (
    make_doc,
    make_docx,
    make_enex,
    make_epub,
    make_odt,
    make_pdf,
    make_ppt,
    make_pptx,
)
from conversadocs_spark.sources.ingest import scan_documents


# --------------------------------------------------------------------------
# parser unit tests
# --------------------------------------------------------------------------


def test_parse_docx():
    rows = formats.parse_docx(make_docx(["Alpha beta.", "Gamma delta."]))
    assert rows == [(None, "Alpha beta. Gamma delta.")]


def test_parse_pptx_one_row_per_slide():
    rows = formats.parse_pptx(make_pptx(["First slide", "Second slide"]))
    assert rows == [(1, "First slide"), (2, "Second slide")]


def test_parse_odt():
    rows = formats.parse_odt(make_odt(["Eins zwei.", "Drei vier."]))
    assert rows == [(None, "Eins zwei. Drei vier.")]


def test_parse_epub_strips_tags_and_scripts():
    rows = formats.parse_epub(make_epub(["Once upon a time."]))
    assert rows == [(1, "Chapter 1 Once upon a time.")]


def test_parse_enex_one_row_per_note():
    rows = formats.parse_enex(
        make_enex([("Note A", "body a"), ("Note B", "body b")])
    )
    assert rows == [(1, "Note A body a"), (2, "Note B body b")]


def test_parse_pdf_real_bytes_per_page():
    rows = formats.parse_pdf(
        make_pdf(["Hello pdf world page one", "And this is page two"])
    )
    assert rows == [
        (1, "Hello pdf world page one"),
        (2, "And this is page two"),
    ]


def test_parse_pdf_escapes():
    # the builder doesn't escape, so assemble a stream with Tj escapes
    stream = zlib.compress(rb"BT (a \(b\) c\\d) Tj ET")
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(stream)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stream
        + b"\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF"
    )
    assert formats.parse_pdf(pdf) == [(1, "a (b) c\\d")]


def test_parse_pdf_rejects_garbage_and_encrypted():
    with pytest.raises(formats.ParseError):
        formats.parse_pdf(b"not a pdf at all")
    with pytest.raises(formats.ParseError):
        formats.parse_pdf(b"%PDF-1.4 /Encrypt junk")


def test_parse_zip_formats_reject_garbage():
    for fn in (formats.parse_docx, formats.parse_pptx,
               formats.parse_odt, formats.parse_epub):
        with pytest.raises(formats.ParseError):
            fn(b"\x00\x01 not a zip")


def test_parse_doc_round_trip_mini_stream():
    """.doc through the CFB reader: the fixture streams sit below the
    4096 mini cutoff, so this exercises the miniFAT path, plus both
    PCD text encodings (the builder splits text into one cp1252 and
    one UTF-16 piece)."""
    rows = formats.parse_doc(
        make_doc(["Alpha beta gamma.", "Second paragraph here."])
    )
    assert rows == [(None, "Alpha beta gamma. Second paragraph here.")]


def test_parse_doc_round_trip_regular_sectors():
    """A WordDocument stream past the mini cutoff must resolve through
    the regular FAT chain across multiple sectors."""
    long_para = "word " * 1500  # ~7.5 KB of text
    rows = formats.parse_doc(make_doc([long_para, "tail marker"]))
    assert rows[0][0] is None
    assert rows[0][1].count("word") == 1500
    assert rows[0][1].endswith("tail marker")


def test_parse_ppt_round_trip():
    rows = formats.parse_ppt(
        make_ppt(["Title text slide", "Body bytes text"])
    )
    assert rows == [(None, "Title text slide Body bytes text")]


def test_parse_ole_rejects_garbage():
    for fn in (formats.parse_doc, formats.parse_ppt):
        with pytest.raises(formats.ParseError):
            fn(b"\xd0\xcf\x11\xe0 truncated header")
        with pytest.raises(formats.ParseError):
            fn(b"not ole at all" * 40)
    # valid container, wrong streams for the format
    ppt_bytes = make_ppt(["x"])
    with pytest.raises(formats.ParseError):
        formats.parse_doc(ppt_bytes)
    with pytest.raises(formats.ParseError):
        formats.parse_ppt(make_doc(["y"]))


@pytest.mark.skipif(
    not formats._HAVE_PYPDF, reason="pypdf not installed in container"
)
def test_parse_pdf_via_pypdf():  # pragma: no cover
    rows = formats.parse_pdf(make_pdf(["library path page"]))
    assert rows[0][0] == 1 and "library path page" in rows[0][1]


# --------------------------------------------------------------------------
# Spark integration: mixed-format directory through scan_documents
# --------------------------------------------------------------------------


def test_scan_documents_parses_binary_formats(spark, tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "a.docx").write_bytes(make_docx(["Docx body text."]))
    (d / "b.pptx").write_bytes(make_pptx(["Slide one", "Slide two"]))
    (d / "c.odt").write_bytes(make_odt(["Odt body text."]))
    (d / "e.epub").write_bytes(make_epub(["Epub chapter text."]))
    (d / "f.enex").write_bytes(make_enex([("T", "enex note body")]))
    (d / "g.pdf").write_bytes(make_pdf(["Pdf page one.", "Pdf page two."]))
    (d / "h.doc").write_bytes(make_doc(["Legacy doc body."]))
    (d / "i.txt").write_text("plain text")
    (d / "j.ppt").write_bytes(make_ppt(["Legacy ppt body."]))
    (d / "k.doc").write_bytes(b"\xd0\xcf\x11\xe0truncated")
    docs = scan_documents(spark, str(d))
    rows = {
        (os.path.basename(r.source), r.page): r.text
        for r in docs.collect()
    }
    assert rows[("a.docx", None)] == "Docx body text."
    assert rows[("b.pptx", 1)] == "Slide one"
    assert rows[("b.pptx", 2)] == "Slide two"
    assert rows[("c.odt", None)] == "Odt body text."
    assert "Epub chapter text." in rows[("e.epub", 1)]
    assert "enex note body" in rows[("f.enex", 1)]
    assert rows[("g.pdf", 1)] == "Pdf page one."
    assert rows[("g.pdf", 2)] == "Pdf page two."
    # legacy OLE formats parse for real through the CFB reader
    assert rows[("h.doc", None)] == "Legacy doc body."
    assert rows[("j.ppt", None)] == "Legacy ppt body."
    # malformed OLE degrades to the marked placeholder, never crashes
    assert rows[("k.doc", 1)].startswith("[unparsed .doc")
    assert rows[("i.txt", None)] == "plain text"


# --------------------------------------------------------------------------
# hypothesis fuzzing: CFB container + legacy parsers over arbitrary input
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from conversadocs_spark.sources.fixtures import make_cfb

_name_st = st.text(
    alphabet=st.characters(min_codepoint=65, max_codepoint=122),
    min_size=1,
    max_size=28,
)
# sizes deliberately straddle the 4096 mini cutoff and the 512/64
# sector boundaries
_data_st = st.binary(min_size=0, max_size=9000)


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(_name_st, _data_st, min_size=1, max_size=4))
def test_cfb_container_round_trips(streams):
    """make_cfb -> _cfb_streams must be the identity on stream
    contents for arbitrary names and sizes — mini-stream (< 4096),
    regular chains (>= 4096), empty streams, and sector-boundary
    sizes all included by the strategy."""
    got = formats._cfb_streams(make_cfb(streams))
    assert got == streams


_words_st = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=25, deadline=None)
@given(_words_st, _words_st)
def test_doc_round_trip_fuzz(words_a, words_b):
    """Arbitrary printable-ASCII paragraphs must survive the .doc
    piece-table round trip (split across the cp1252 and UTF-16
    pieces at an arbitrary midpoint)."""
    paragraphs = [" ".join(words_a), " ".join(words_b)]
    rows = formats.parse_doc(make_doc(paragraphs))
    assert rows[0][0] is None
    expected = formats._clean(" ".join(paragraphs))
    assert rows[0][1] == expected


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=60), min_size=1, max_size=8))
def test_ppt_round_trip_fuzz(texts):
    """Arbitrary unicode text atoms must survive the .ppt record-walk
    round trip (TextCharsAtom carries any codepoint; TextBytesAtom
    slots are cp1252-coerced by the builder, so feed it only through
    even indices)."""
    # builder alternates utf-16 / cp1252 atoms; make odd slots safe
    safe = [
        t if i % 2 == 0 else t.encode("cp1252", "replace").decode("cp1252")
        for i, t in enumerate(texts)
    ]
    rows = formats.parse_ppt(make_ppt(safe))
    assert rows[0][0] is None
    assert rows[0][1] == formats._clean("\n".join(safe))
