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


def test_resize_quarantines_fake_media_payloads(spark, sf_dir):
    """The fixture media table's payloads are utf-8 text, not PNGs —
    the (now real) resize stage must quarantine every image row with
    a decode error rather than raising (the stub this test previously
    pinned was replaced by the stdlib PNG codec in functions/png.py)."""
    rows = resize_image(_media(spark, sf_dir), 224, 224).collect()
    assert rows  # image rows present
    assert all(r["payload"] is None and r["error"] for r in rows)


def test_png_roundtrip_all_filters():
    """Every scanline filter type the spec defines must decode back
    to the original pixels — gray and RGB."""
    import numpy as np

    from conversadocs_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    for f in range(5):
        assert (decode_png(encode_png(gray, f)) == gray).all()
        assert (decode_png(encode_png(rgb, f)) == rgb).all()


def test_png_resize_nearest_semantics():
    import numpy as np

    from conversadocs_spark.functions.png import resize_nearest

    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8)
    # each source pixel becomes a 2x2 block
    assert (up[0:2, 0:2] == arr[0, 0]).all()
    assert (up[6:8, 6:8] == arr[3, 3]).all()
    down = resize_nearest(arr, 2, 2)
    assert (down == np.array([[0, 2], [8, 10]], dtype=np.uint8)).all()


def test_resize_image_decodes_resizes_and_quarantines(spark):
    """The mapInPandas stage must resize real PNG payloads (verified
    by decoding the output bytes) and quarantine undecodable rows
    with an error instead of failing the stage."""
    import numpy as np

    from conversadocs_spark.functions.png import decode_png, encode_png
    from conversadocs_spark.operators.multimodal import resize_image

    rng = np.random.default_rng(3)
    rows = []
    originals = {}
    for i in range(4):
        arr = rng.integers(0, 256, (20 + i, 30 + i, 3), dtype=np.uint8)
        originals[i] = arr
        rows.append(
            (i, "image", bytearray(encode_png(arr)), 30 + i, 20 + i, "png")
        )
    rows.append((99, "image", bytearray(b"not a png"), 1, 1, "png"))
    rows.append((100, "audio", bytearray(b"\x00\x01"), 0, 0, "pcm"))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "width int, height int, format string",
    )
    got = {
        r["media_id"]: r
        for r in resize_image(media, 16, 12).collect()
    }
    assert set(got) == {0, 1, 2, 3, 99}  # audio filtered, corrupt kept
    assert got[99]["payload"] is None
    assert "PNG" in got[99]["error"] or "signature" in got[99]["error"]
    from conversadocs_spark.functions.png import resize_nearest

    for i in range(4):
        out = decode_png(bytes(got[i]["payload"]))
        assert out.shape == (12, 16, 3)
        assert (out == resize_nearest(originals[i], 16, 12)).all()


def test_wav_roundtrip_and_stereo_downmix():
    import numpy as np

    from conversadocs_spark.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    pcm = rng.integers(-32768, 32767, 4000, dtype=np.int16)
    rate, x = decode_wav(encode_wav(pcm, 8000))
    assert rate == 8000
    assert np.allclose(x * 32768.0, pcm.astype(np.float64))
    # corrupt container rejected with a named error
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")


def test_audio_features_recover_injected_tone(spark):
    """The registered query synthesizes tones at 200 + 20*(id%50) Hz;
    the FFT-based featurizer must recover exactly that dominant
    frequency for every row (bin width 2 Hz at 0.5 s / 8 kHz), with
    no quarantined rows."""
    from conversadocs_spark.plans import QUERIES

    rows = QUERIES["multimodal_audio"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["error"] is None
        want = 200.0 + 20.0 * (r["media_id"] % 50)
        assert r["dominant_hz"] == pytest.approx(want, abs=2.0)
        assert r["duration_s"] == pytest.approx(0.5, abs=1e-6)
        assert 0.3 < r["rms"] < 0.5  # 0.6-amplitude sine ~ 0.42


def test_featurize_audio_quarantines_non_wav(spark):
    from conversadocs_spark.operators.multimodal import featurize_audio

    media = spark.createDataFrame(
        [(1, "audio", bytearray(b"junk"), 0, 0, "wav"),
         (2, "image", bytearray(b"x"), 0, 0, "png")],
        "media_id long, kind string, payload binary, "
        "width int, height int, format string",
    )
    rows = featurize_audio(media).collect()
    assert len(rows) == 1  # image filtered
    assert rows[0]["error"] and rows[0]["rms"] is None


# hypothesis fuzz: PNG round-trip over arbitrary sizes/content/filters
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    rgb=st.booleans(),
    ftype=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_fuzz(h, w, rgb, ftype, seed):
    import numpy as np

    from conversadocs_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(arr, ftype))
    assert out.shape == arr.shape
    assert (out == arr).all()
