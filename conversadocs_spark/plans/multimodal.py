"""Multimodal driver queries: binary payload columns + typed metadata
through real Arrow kernels.

``multimodal_meta`` is hash-checked: the Spark side pushes every byte
through the mapInPandas decode kernel and reports byte counts +
metadata, which DuckDB reproduces from the raw text (utf-8 length) —
so the oracle validates the binary plumbing end to end, not just row
counts. The feature vectors and frame fan-out are rows-only (byte
histograms aren't reasonably SQL-expressible) with property tests in
tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.operators.multimodal import (
    featurize_media,
    media_from_documents,
    sample_frames,
)
from conversadocs_spark.plans.registry import register

_MULTIMODAL_META_ORACLE = """
SELECT doc_id                                           AS media_id,
       ['image','audio','video'][(doc_id % 3) + 1]      AS kind,
       CAST(octet_length(encode(text)) AS INTEGER)      AS n_bytes,
       CAST((doc_id % 16) * 64 + 64 AS INTEGER)         AS width,
       CAST((doc_id % 9) * 64 + 64 AS INTEGER)          AS height
FROM documents
"""


@register(
    "multimodal_meta", oracle=_MULTIMODAL_META_ORACLE, tags=("multimodal",)
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media table -> mapInPandas decode kernel -> metadata
    projection. Every payload byte crosses the Arrow boundary and is
    counted inside the Python kernel; the oracle recomputes the counts
    from the source text."""
    docs = io.table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    feats = featurize_media(media)
    return feats.select("media_id", "kind", "n_bytes", "width", "height")


@register("multimodal_features", tags=("multimodal", "rows-only"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full featurize pass: unit-norm byte-histogram vectors per media
    row (the CNN-embedding stand-in)."""
    docs = io.table(spark, sf_dir, "documents")
    feats = featurize_media(media_from_documents(docs))
    return feats.select(
        "media_id",
        "kind",
        F.size("features").alias("dim"),
        F.round(
            F.aggregate(
                "features",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sq_norm"),
    )


@register("multimodal_frames", tags=("multimodal", "rows-only"))
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling fan-out: 1 media row -> N sampled frame
    rows with per-frame digests."""
    docs = io.table(spark, sf_dir, "documents")
    return sample_frames(media_from_documents(docs))
