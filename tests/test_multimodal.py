"""Multimodal plumbing tests: binary payload integrity across Arrow,
feature determinism across partitionings, frame fan-out shape, and the
explicit resize stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.operators.multimodal import (
    FEATURE_DIM,
    featurize_media,
    media_from_documents,
    resize_image,
    sample_frames,
)


def _media(spark, sf_dir, n=60):
    docs = io.table(spark, sf_dir, "documents").where(F.col("doc_id") < n)
    return media_from_documents(docs)


def test_features_deterministic_across_partitionings(spark, sf_dir):
    media = _media(spark, sf_dir)

    def run(df):
        return {
            (r.media_id, tuple(r.features))
            for r in featurize_media(df).collect()
        }

    assert run(media.repartition(1)) == run(media.repartition(11))


def test_feature_shape_and_norm(spark, sf_dir):
    feats = featurize_media(_media(spark, sf_dir)).collect()
    assert all(len(r.features) == FEATURE_DIM for r in feats)
    for r in feats:
        sq = sum(x * x for x in r.features)
        assert abs(sq - 1.0) < 1e-3
    # byte counts survive the Arrow round-trip exactly
    docs = {
        r.doc_id: len(r.text.encode("utf-8"))
        for r in io.table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 60)
        .collect()
    }
    assert {r.media_id: r.n_bytes for r in feats} == docs


def test_frame_sampling_fanout(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = sample_frames(media, frame_size=64, stride=2).collect()
    videos = {r.media_id for r in media.where("kind = 'video'").collect()}
    assert {r.media_id for r in frames} == videos
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    payload_len = {
        r.media_id: len(bytes(r.payload))
        for r in media.where("kind = 'video'").collect()
    }
    for mid, rows in by_media.items():
        n_frames = -(-payload_len[mid] // 64)  # ceil
        expected = len(range(0, n_frames, 2))
        assert len(rows) == expected
        assert sorted(r.frame_no for r in rows) == list(range(expected))


def test_resize_is_an_explicit_stub(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        resize_image(_media(spark, sf_dir), 224, 224)
