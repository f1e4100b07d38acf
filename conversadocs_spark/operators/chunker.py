"""Distributed chunk splitting (reference R4/R5): 1 document -> N chunk
rows, metadata inherited — the flatMap at the head of the reference's
ingest pipeline (bones.py:67-68).

Spark form: an Arrow-batched pandas_udf wrapping the pure
``chunk_text`` kernel returns array<string>; ``posexplode`` turns it
into chunk rows with a stable per-document sequence number. Python is
unavoidable here (recursive string algorithm), so it runs vectorized
over Arrow batches — and the kernel is pure, so the stage is
embarrassingly parallel and deterministic at any partition count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from conversadocs_spark.functions.text import DEFAULT_SEPARATORS, chunk_text


def split_documents(
    docs: DataFrame,
    chunk_size: int = 1000,
    overlap: int = 150,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """documents -> chunks (keep_cols..., seq int, chunk string).

    Provenance columns are inherited by every chunk, the way the
    reference's splitter copies Document.metadata to each piece.
    """

    @F.pandas_udf(ArrayType(StringType()))
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: chunk_text(
                t or "", chunk_size, overlap, separators
            )
        )

    return docs.select(
        *keep_cols,
        F.posexplode(chunk_udf(F.col(text_col))).alias("seq", "chunk"),
    )


def split_fixed(
    docs: DataFrame,
    chunk_size: int = 100,
    overlap: int = 20,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Fixed-width chunk grid — the SQL-expressible simplification of
    the splitter (SURVEY.md §2B): chunk i = substring(text,
    i*(size-overlap)+1, size). Pure Catalyst expressions (sequence +
    posexplode + substring), no Python at all — prefer this form in
    100 TB pipelines when separator awareness isn't required.
    """
    step = chunk_size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    last_idx = F.greatest(
        F.floor((F.length(F.col(text_col)) - 1) / step).cast("int"),
        F.lit(0),
    )
    exploded = docs.select(
        *keep_cols,
        F.col(text_col),
        F.posexplode(F.sequence(F.lit(0), last_idx)).alias("seq", "i"),
    ).where(F.col("i") * step < F.length(F.col(text_col)))
    return exploded.select(
        *keep_cols,
        "seq",
        F.col(text_col)
        .substr(F.col("i") * step + 1, F.lit(chunk_size))
        .alias("chunk"),
    )
