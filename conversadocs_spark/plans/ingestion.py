"""Driver-visible ingestion queries (rows-only): the reference's entry
point (R1/R2/R3 multi-format scan) and its index lifecycle (R7/R8
overwrite build), run against scratch directories under the repo.

Rows-only because file scanning and parquet writes aren't
SQL-expressible over the fixture views; tests/test_ingest.py carries
the behavioral assertions (unknown-extension drop, tag stripping,
empty-scan fallback, overwrite-replaces, dynamic partition overwrite).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.plans.registry import register
from conversadocs_spark.sources.ingest import (
    scan_documents,
    stage_text_corpus,
)
from conversadocs_spark.sources.sink import (
    build_vector_index,
    read_index,
)

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".ingest_stage",
)


@register("ingest_scan_text", tags=("ingest", "rows-only"))
def ingest_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format directory scan: 50 fixture docs staged as loose
    .txt/.md/.html files plus an unsupported-extension decoy; the scan
    must parse exactly the 50 supported files (R1 dispatch + R2
    unknown-ext filter) with provenance columns."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    corpus_dir = os.path.join(_SCRATCH, f"corpus_{tag}")
    stage_text_corpus(spark, sf_dir, corpus_dir, n_docs=50)
    docs = scan_documents(spark, corpus_dir)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.regexp_extract("source", r"(\.[a-z]+)$", 1).alias("ext"),
        "page",
    )


@register("index_build_overwrite", tags=("ingest", "rows-only"))
def index_build_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7/R8 lifecycle: build the chunk+embedding index from a small
    corpus, then REBUILD it from a larger one at the same path — the
    read-back must reflect only the second build (the reference's
    'previous DB discarded' semantics, bones.py:112-114)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    index_path = os.path.join(_SCRATCH, f"index_{tag}")
    docs = io.table(spark, sf_dir, "documents")
    build_vector_index(
        docs.where(F.col("doc_id") < 20), index_path, chunk_size=120,
        overlap=30,
    )
    build_vector_index(
        docs.where(F.col("doc_id") < 60), index_path, chunk_size=120,
        overlap=30,
    )
    idx = read_index(spark, index_path)
    return idx.select(
        "chunk_id",
        "doc_id",
        "seq",
        F.size("embedding").alias("dim"),
        F.length("chunk").alias("chunk_len"),
    )
