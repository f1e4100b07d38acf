"""Index build + overwrite lifecycle (reference R7/R8).

The reference materializes (chunk, vector) pairs in RAM and REBUILDS
the store from scratch on every upload, discarding the previous one
(/root/reference/conversadocs/bones.py:74,107-119; README.md:7 "the
vector database is replaced"). The Spark mapping: the index IS a
parquet table; "rebuild replaces previous" is overwrite-mode write.

At 100 TB the full-overwrite is the reference-faithful default, and
``partition_by`` enables the incremental posture (dynamic partition
overwrite rewrites only the partitions present in the new batch —
re-ingesting one source leaves the rest of the index untouched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from conversadocs_spark.operators.chunker import split_documents
from conversadocs_spark.operators.embed import (
    DEFAULT_EMBED_DIM,
    mock_embed_udf,
)


def write_index_overwrite(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
) -> None:
    """Replace the index at ``path`` with ``df`` (R8 semantics).

    With ``partition_by``, dynamic partition overwrite only replaces
    partitions that appear in ``df`` — the scale-friendly rebuild.
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(partition_by)
    writer.parquet(path)


def build_vector_index(
    docs: DataFrame,
    out_path: str,
    chunk_size: int = 1000,
    overlap: int = 150,
    dim: int = DEFAULT_EMBED_DIM,
) -> None:
    """The reference's full ingest job (SURVEY §3.1): documents ->
    recursive chunk split (R4) -> embed (R6) -> overwrite-mode index
    write (R7/R8). One linear pipeline, no shuffle until the write."""
    from pyspark.sql import functions as F

    chunks = split_documents(
        docs, chunk_size=chunk_size, overlap=overlap
    ).withColumn(
        "chunk_id", F.xxhash64("doc_id", "seq")
    )
    embedded = chunks.select(
        "chunk_id",
        "doc_id",
        "seq",
        "chunk",
        "source",
        mock_embed_udf(dim)(F.col("chunk")).alias("embedding"),
    )
    write_index_overwrite(embedded, out_path)


def read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
