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


@register("multimodal_audio", tags=("multimodal", "rows-only"))
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + spectral featurization end-to-end
    (operators/multimodal.py:featurize_audio + the stdlib WAV parser
    in functions/wav.py): each audio-kind media row gets a synthetic
    PCM16 tone whose frequency is a pure function of media_id
    (200 + 20*(media_id % 50) Hz plus deterministic noise), and the
    stage must recover that tone as ``dominant_hz`` via the FFT — so
    the driver's rows-only count rides on a pipeline whose OUTPUT is
    physically checkable, and
    tests/test_multimodal.py::test_audio_features_recover_injected_tone
    pins the recovery exactly."""
    import numpy as np
    import pandas as pd

    from conversadocs_spark.functions.wav import encode_wav
    from conversadocs_spark.operators.multimodal import featurize_audio

    docs = io.table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 60
    )
    base = media_from_documents(docs).where(F.col("kind") == "audio")

    def make_wav(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                mid = int(r["media_id"])
                rng = np.random.default_rng(mid)
                rate, dur = 8000, 0.5
                t = np.arange(int(rate * dur)) / rate
                freq = 200.0 + 20.0 * (mid % 50)
                sig = 0.6 * np.sin(2 * np.pi * freq * t)
                sig = sig + 0.05 * rng.standard_normal(len(t))
                pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
                out.append(
                    (mid, "audio", encode_wav(pcm, rate), 0, 0, "wav")
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "payload",
                    "width", "height", "format",
                ],
            )

    media = base.mapInPandas(
        make_wav,
        schema=(
            "media_id long, kind string, payload binary, "
            "width int, height int, format string"
        ),
    )
    return featurize_audio(media).orderBy("media_id")
