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
strip) parse for real; the binary formats (pdf/doc/docx/enex/epub/
odt/ppt/pptx) have their parser STUBBED with a deterministic
placeholder (clearly marked below) because the parsing libraries are
not installed — the Spark-side plumbing (scan, dispatch, batch shape,
schema, provenance) is identical either way and is what's tested.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark.serde import pickle_module_by_value

#: extension -> parser kind, mirroring the reference's EXTENSIONS table
#: (bones.py:32-44). "text"/"html" parse here; "stub" marks formats
#: whose real parser library is not in this container.
EXTENSIONS: dict[str, str] = {
    ".txt": "text",
    ".md": "text",
    ".html": "html",
    ".pdf": "stub",
    ".doc": "stub",
    ".docx": "stub",
    ".enex": "stub",
    ".epub": "stub",
    ".odt": "stub",
    ".ppt": "stub",
    ".pptx": "stub",
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
        elif kind == "stub":
            # STUB: real parser (PyPDF/Unstructured/EverNote analog)
            # not available in this container. Deterministic
            # placeholder keeps the pipeline testable; swap this
            # branch for the real decoder in production.
            out.append(
                {
                    "source": path,
                    "page": 1,
                    "text": f"[unparsed {ext} document: "
                    f"{len(bytes(content))} bytes]",
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
    """Materialize fixture documents as loose .txt/.md/.html files (plus
    one unknown-extension decoy that ingestion must drop) so
    scan_documents has a real mixed-format directory to read."""
    from conversadocs_spark import io

    os.makedirs(out_dir, exist_ok=True)
    rows = (
        io.table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < n_docs)
        .select("doc_id", "text")
        .collect()
    )
    exts = (".txt", ".md", ".html")
    for r in rows:
        ext = exts[r.doc_id % len(exts)]
        body = r.text
        if ext == ".html":
            body = f"<html><body><p>{body}</p></body></html>"
        with open(
            os.path.join(out_dir, f"doc_{r.doc_id:05d}{ext}"),
            "w",
            encoding="utf-8",
        ) as f:
            f.write(body)
    with open(os.path.join(out_dir, "ignore_me.xyz"), "w") as f:
        f.write("unsupported format — must be dropped by the scan")
    return out_dir


pickle_module_by_value(__name__)
