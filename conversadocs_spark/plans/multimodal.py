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


@register("multimodal_resize", tags=("multimodal", "rows-only"))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end (operators/multimodal.py:
    resize_image + the stdlib PNG codec in functions/png.py): each
    image-kind media row gets a deterministic synthetic PNG payload
    (pixels seeded from media_id), the stage decodes, nearest-resizes
    to 16x12, re-encodes, and the query returns per-image byte counts
    and a digest of the RESIZED pixels — so the driver's rows-only
    count covers the full decode->resize->encode path, not a stub.
    Rows-only: the pixel pipeline has no SQL form; value-level pins
    live in tests/test_multimodal.py (round-trip over all five PNG
    filter types, nearest-neighbor semantics, corrupt-payload
    quarantine)."""
    import hashlib

    import numpy as np
    import pandas as pd

    from conversadocs_spark.functions.png import encode_png
    from conversadocs_spark.operators.multimodal import resize_image

    docs = io.table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 60
    )
    base = media_from_documents(docs).where(F.col("kind") == "image")

    def make_png(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                rng = np.random.default_rng(int(r["media_id"]))
                arr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
                out.append(
                    (int(r["media_id"]), "image", encode_png(arr),
                     32, 24, "png")
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "payload",
                    "width", "height", "format",
                ],
            )

    media = base.mapInPandas(
        make_png,
        schema=(
            "media_id long, kind string, payload binary, "
            "width int, height int, format string"
        ),
    )
    resized = resize_image(media, 16, 12)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("digest"),
    ).orderBy("media_id")
