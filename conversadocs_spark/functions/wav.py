"""Minimal WAV (RIFF PCM16) codec + spectral features: stdlib struct
and numpy only, so the multimodal audio stage
(operators/multimodal.py:featurize_audio) runs a REAL decode ->
feature-extract without librosa/soundfile (not in this container).

Supported: PCM (format tag 1), 16-bit, mono or stereo (stereo is
averaged to mono on decode). Unsupported variants raise ValueError
naming the field — never silently-wrong samples.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("samples must be 1-D int16")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, mono float64 samples in [-1, 1))."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen % 2)
        if cid == b"fmt ":
            tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            pcm = tag
        elif cid == b"data":
            samples = body
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    if pcm != 1:
        raise ValueError(f"unsupported format tag {pcm} (need PCM=1)")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits}")
    if channels not in (1, 2):
        raise ValueError(f"unsupported channel count {channels}")
    arr = np.frombuffer(
        samples[: len(samples) - len(samples) % (2 * channels)],
        dtype="<i2",
    ).astype(np.float64)
    if channels == 2:
        arr = arr.reshape(-1, 2).mean(axis=1)
    return rate, arr / 32768.0


def audio_features(rate: int, x: np.ndarray) -> dict:
    """Deterministic spectral/energy features of a mono signal:
    duration, RMS, zero-crossing rate, dominant frequency (rFFT
    argmax) and spectral centroid — the cheap audio-quality signals a
    corpus sweep buckets on."""
    n = len(x)
    if n == 0:
        raise ValueError("empty signal")
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    dom = float(freqs[int(np.argmax(mag[1:])) + 1]) if len(mag) > 1 else 0.0
    centroid = (
        float((freqs * mag).sum() / mag.sum()) if mag.sum() > 0 else 0.0
    )
    return {
        "duration_s": n / rate,
        "rms": rms,
        "zcr": zcr,
        "dominant_hz": dom,
        "centroid_hz": centroid,
    }


from conversadocs_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)
