"""Multi-format document scan (reference R1/R2/R3).

The reference dispatches on file extension over 11 formats to LangChain
loader classes (/root/reference/conversadocs/bones.py:32-44), silently
drops unknown extensions (bones.py:57-58), and falls back to a demo
corpus when nothing loads (bones.py:61-64).

Spark-first design: ONE binaryFile scan of the directory (columnar,
partition-parallel, no driver-side file loop), extension dispatch as a
column filter, and per-format parsing inside an Arrow ``mapInPandas``
— so adding a format is adding a kernel function, not a new scan.

Format support in this container: txt/md (utf-8 decode) and html (tag
strip) parse inline; pdf/docx/pptx/odt/epub/enex AND the legacy OLE
``.doc``/``.ppt`` parse REAL bytes via the stdlib kernels in
``formats.py`` (zipfile/zlib/xml.etree plus a minimal [MS-CFB]
compound-file reader — see that module for the pypdf production
upgrade path). Malformed bytes in any format degrade to a
deterministic, clearly-marked placeholder row; the Spark-side
plumbing (scan, dispatch, batch shape, schema, provenance) is
identical and tested either way.
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark.serde import pickle_module_by_value
from conversadocs_spark.sources import formats

#: extension -> parser kind, mirroring the reference's EXTENSIONS table
#: (bones.py:32-44). "text"/"html" parse inline; "kernel" dispatches
#: to the stdlib parsers in formats.PARSERS (which degrade to a
#: placeholder row on unparseable/unsupported bytes).
EXTENSIONS: dict[str, str] = {
    ".txt": "text",
    ".md": "text",
    ".html": "html",
    ".pdf": "kernel",
    ".doc": "kernel",
    ".docx": "kernel",
    ".enex": "kernel",
    ".epub": "kernel",
    ".odt": "kernel",
    ".ppt": "kernel",
    ".pptx": "kernel",
}

#: R3: the default corpus used when a scan yields nothing, standing in
#: for the reference's demo_docs/demo.txt fallback (bones.py:61-64).
DEFAULT_CORPUS: tuple[str, ...] = (
    "Welcome to the engine. This demo document stands in for "
    "demo_docs/demo.txt: it is loaded whenever an ingest scan finds "
    "no supported files.",
    "A second demo paragraph keeps the fallback corpus non-trivial so "
    "downstream chunking and retrieval have something to do.",
)

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

DOC_SCHEMA = "source string, page int, text string"


def _parse_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Kernel: (path, content) rows -> (source, page, text) rows."""
    out: list[dict] = []
    for path, content in zip(pdf["path"], pdf["content"]):
        ext = os.path.splitext(path)[1].lower()
        kind = EXTENSIONS.get(ext)
        if kind == "text":
            text = bytes(content).decode("utf-8", errors="replace")
            out.append({"source": path, "page": None, "text": text})
        elif kind == "html":
            raw = bytes(content).decode("utf-8", errors="replace")
            text = _WS_RE.sub(" ", _TAG_RE.sub(" ", raw)).strip()
            out.append({"source": path, "page": None, "text": text})
        elif kind == "kernel":
            data = bytes(content)
            try:
                rows = formats.PARSERS[ext](data)
                out.extend(
                    {"source": path, "page": page, "text": text}
                    for page, text in rows
                )
            except formats.ParseError:
                # Unparseable bytes or a format with no in-container
                # parser (legacy OLE .doc/.ppt): deterministic marked
                # placeholder instead of failing the task.
                out.append(
                    {
                        "source": path,
                        "page": 1,
                        "text": f"[unparsed {ext} document: "
                        f"{len(data)} bytes]",
                    }
                )
        # unknown extensions were filtered before the kernel (R2)
    return pd.DataFrame(out, columns=["source", "page", "text"])


def _parse_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _parse_batch(pdf)


def scan_documents(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of mixed-format files into document rows
    (doc_id, text, source, page).

    R1: one binaryFile scan + per-format parse kernels (mapInPandas).
    R2: unknown extensions are filtered out BEFORE parsing — predicate
        on the path column, pushed into the file index.
    R3: if nothing survives, the default corpus is returned instead.

    doc_id is a deterministic hash of (source, page) so re-scans and
    retries assign stable ids without a driver-side sequence.
    """
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    known = files.where(
        F.lower(
            F.regexp_extract(F.col("path"), r"(\.[A-Za-z0-9]+)$", 1)
        ).isin(*EXTENSIONS.keys())
    )
    parsed = known.mapInPandas(_parse_map, schema=DOC_SCHEMA)
    docs = parsed.select(
        F.xxhash64("source", F.coalesce("page", F.lit(-1))).alias("doc_id"),
        "text",
        "source",
        "page",
    )
    if docs.isEmpty():
        fallback = spark.createDataFrame(
            [
                (i, t, "demo://fallback", None)
                for i, t in enumerate(DEFAULT_CORPUS)
            ],
            schema="doc_id long, text string, source string, page int",
        )
        return fallback
    return docs


def stage_text_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str, n_docs: int = 50
) -> str:
    """Materialize fixture documents as loose files cycling through the
    supported formats — text (.txt/.md/.html) AND real binary
    containers (.docx/.pdf/.pptx/.odt/.epub/.enex built by
    fixtures.py) — plus one unknown-extension decoy that ingestion
    must drop, so scan_documents has a genuine mixed-format directory
    exercising every real parse kernel. Each staged file carries one
    fixture document (single page/slide/note), so the scan yields
    exactly ``n_docs`` rows."""
    from conversadocs_spark import io
    from conversadocs_spark.sources import fixtures

    # Re-staging must be idempotent: clear leftovers from a previous
    # staging (e.g. an older extension cycle) or the scan sees extras.
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # TEST STAGING ONLY — never call from an operator: this collect
    # is bounded by n_docs and exists solely to write fixture files
    # the scan under test then reads (tests/lint pin: the only
    # sanctioned .collect() sites are staging helpers like this).
    rows = (
        io.table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < n_docs)
        .select("doc_id", "text")
        .collect()
    )
    binary_builders = {
        ".docx": lambda t: fixtures.make_docx([t]),
        ".pdf": lambda t: fixtures.make_pdf([t]),
        ".pptx": lambda t: fixtures.make_pptx([t]),
        ".odt": lambda t: fixtures.make_odt([t]),
        ".epub": lambda t: fixtures.make_epub([t]),
        ".enex": lambda t: fixtures.make_enex([("note", t)]),
    }
    exts = (".txt", ".md", ".html", *binary_builders)
    for r in rows:
        ext = exts[r.doc_id % len(exts)]
        path = os.path.join(out_dir, f"doc_{r.doc_id:05d}{ext}")
        if ext in binary_builders:
            with open(path, "wb") as f:
                f.write(binary_builders[ext](r.text))
        else:
            body = r.text
            if ext == ".html":
                body = f"<html><body><p>{body}</p></body></html>"
            with open(path, "w", encoding="utf-8") as f:
                f.write(body)
    with open(os.path.join(out_dir, "ignore_me.xyz"), "w") as f:
        f.write("unsupported format — must be dropped by the scan")
    return out_dir


pickle_module_by_value(formats.__name__)
pickle_module_by_value(__name__)
