"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
with decode / feature-extract / frame-sample as Arrow kernels.

North-star surface (BASELINE.json "multimodal columns"): a 100 TB
training-data pipeline carries images/audio/video as binary columns
next to typed metadata, and runs decode + featurize as partition-
parallel Python stages. PIL/opencv/librosa are NOT in this container;
since r6 the image and audio paths are REAL anyway: `resize_image`
decodes/resizes/re-encodes through the stdlib PNG codec
(functions/png.py — zlib, all five scanline filters) and
`featurize_audio` parses RIFF PCM16 and computes FFT spectral
features (functions/wav.py), both with per-row quarantine for
undecodable payloads. Only the generic `featurize_media` histogram
and the video frame-split remain deterministic byte-level stand-ins
(clearly marked below). Everything Spark-side —
schema, Arrow batch shape, iterator-form per-partition init,
explode-style frame fan-out, partitioning — is real and tested.

Kernel forms chosen deliberately:
- ``featurize_media``: ``mapInPandas`` ITERATOR form — the pattern for
  per-partition model/codec init (load once, stream batches through),
  which is the only affordable shape when the decoder costs seconds to
  initialize.
- ``sample_frames``: 1 media row -> N frame rows (the video flatMap).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conversadocs_spark.serde import pickle_module_by_value

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, format string"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, width int, height int, "
    f"features array<float>"
)

FRAMES_SCHEMA = (
    "media_id long, frame_no int, frame_bytes int, frame_digest string"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's utf-8 bytes
    become an opaque payload with typed metadata (the schema a real
    image/audio table has; payload content is irrelevant to the
    plumbing under test)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        ((F.col("doc_id") % 16) * 64 + 64).cast("int").alias("width"),
        ((F.col("doc_id") % 9) * 64 + 64).cast("int").alias("height"),
        F.lit("raw").alias("format"),
    )


def _byte_histogram(payload: bytes, dim: int) -> list[float]:
    """STUB feature extractor: L2-normalized histogram of byte values
    bucketed into ``dim`` bins — a deterministic, content-sensitive
    stand-in for a CNN/CLAP embedding. Swap for the real model inside
    the same iterator kernel."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * dim
    hist = np.bincount(arr // (256 // dim), minlength=dim).astype(
        np.float64
    )
    norm = float(np.linalg.norm(hist))
    return (hist / norm).astype(np.float32).tolist() if norm else [0.0] * dim


def featurize_media(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Decode + featurize every media row (mapInPandas, iterator form).

    The iterator kernel initializes its "codec" ONCE per partition
    (here: trivially; in production: model load) and then streams
    Arrow batches — the per-partition-init idiom from SURVEY §4.2.4.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init happens HERE (once), not per batch/row.
        codec_ready = True  # stand-in for expensive codec/model init
        assert codec_ready
        for pdf in batches:
            feats = [
                _byte_histogram(bytes(p), dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "features": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, frame_size: int = 64, stride: int = 2
) -> DataFrame:
    """Video frame sampling: split each payload into ``frame_size``-byte
    "frames", keep every ``stride``-th one — the 1->N fan-out shape of
    real frame extraction (ffmpeg would produce the frames; the
    chunk-split stand-in is deterministic and library-free)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                frames = [
                    raw[i : i + frame_size]
                    for i in range(0, len(raw), frame_size)
                ]
                for no, fr in enumerate(frames[::stride]):
                    out.append(
                        {
                            "media_id": mid,
                            "frame_no": no,
                            "frame_bytes": len(fr),
                            "frame_digest": hashlib.sha256(fr).hexdigest()[
                                :12
                            ],
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "frame_no",
                    "frame_bytes",
                    "frame_digest",
                ],
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        kernel, schema=FRAMES_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, width int, height int, format string, "
    "payload binary, error string"
)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize, no external codec: the stdlib PNG codec
    (functions/png.py — zlib inflate, all five scanline filters) and
    a nearest-neighbor resample run decode -> resize -> re-encode per
    image row inside one mapInPandas pass. Rows whose payload is not
    a decodable PNG come back with ``payload NULL`` and the decode
    error in ``error`` — the quarantine-not-crash contract a 100 TB
    media sweep needs (one corrupt image must never kill the stage).

    Scale shape: pure map, no shuffle; Arrow batches carry the binary
    column, and per-row cost is the pixel count — exactly the stage
    you size executors' Python memory for (`spark.sql.execution.
    arrow.maxRecordsPerBatch` caps the batch bytes)."""

    # Imported at closure-build time (NOT inside the kernel): the
    # png module is registered for by-value pickling, so capturing
    # the function objects here ships them to workers that cannot
    # import the package themselves (serde.py contract; a worker-side
    # import statement would defeat it).
    from conversadocs_spark.functions.png import (
        decode_png,
        encode_png,
        resize_nearest,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                try:
                    arr = decode_png(bytes(r["payload"]))
                    resized = resize_nearest(arr, width, height)
                    out.append(
                        (
                            r["media_id"],
                            width,
                            height,
                            "png",
                            encode_png(resized),
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 — quarantine row
                    out.append(
                        (r["media_id"], None, None, None, None, str(e)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "format",
                    "payload",
                    "error",
                ],
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


pickle_module_by_value(__name__)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, duration_s double, rms double, "
    "zcr double, dominant_hz double, centroid_hz double, error string"
)


def featurize_audio(media: DataFrame) -> DataFrame:
    """REAL audio featurization, no external codec: the stdlib WAV
    parser (functions/wav.py — RIFF PCM16, mono/stereo) decodes each
    audio payload and numpy computes duration / RMS / zero-crossing
    rate / dominant frequency / spectral centroid in one mapInPandas
    pass. Undecodable rows come back with the features NULL and the
    error captured — the same quarantine-not-crash contract as
    resize_image. Pure map, no shuffle."""
    from conversadocs_spark.functions.wav import (
        audio_features,
        decode_wav,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                try:
                    rate, x = decode_wav(bytes(r["payload"]))
                    f = audio_features(rate, x)
                    out.append(
                        (
                            r["media_id"],
                            rate,
                            round(f["duration_s"], 6),
                            round(f["rms"], 6),
                            round(f["zcr"], 6),
                            round(f["dominant_hz"], 6),
                            round(f["centroid_hz"], 6),
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 — quarantine row
                    out.append(
                        (r["media_id"], None, None, None, None, None,
                         None, str(e)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "duration_s", "rms",
                    "zcr", "dominant_hz", "centroid_hz", "error",
                ],
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA
    )
