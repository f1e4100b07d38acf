"""Minimal PNG codec (stdlib zlib + numpy): enough of ISO/IEC 15948
to decode and re-encode the 8-bit grayscale/RGB non-interlaced images
a training pipeline actually stores, so the multimodal resize stage
(operators/multimodal.py:resize_image) can run a REAL
decode -> resize -> encode without PIL/opencv (not present in this
container).

Supported: bit depth 8, color types 0 (grayscale) and 2 (RGB),
interlace 0, all five scanline filter types on decode (None/Sub/Up/
Average/Paeth — an encoder may pick any per row); encode emits a
caller-chosen uniform filter type (default 0) so tests can exercise
every decoder branch with real bytes. Unsupported features raise
ValueError with the offending field named — never a wrong pixel.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit grayscale (h, w) or RGB (h, w, 3) array -> PNG bytes.
    ``filter_type`` applies to every scanline (0..4)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"dtype must be uint8, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, bpp = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, bpp = 2, 3
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter_type {filter_type}")
    h, w = arr.shape[0], arr.shape[1]
    raw = arr.reshape(h, w * bpp).astype(np.int32)
    prev = np.zeros(w * bpp, dtype=np.int32)
    lines = []
    for y in range(h):
        cur = raw[y]
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        b = prev
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - a
        elif filter_type == 2:
            f = cur - b
        elif filter_type == 3:
            f = cur - (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
            f = cur - pred
        lines.append(bytes([filter_type]) + (f % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for grayscale, (h, w, 3) for
    RGB. Handles all five filter types; rejects interlaced /
    paletted / 16-bit images explicitly."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if color_type not in (0, 2):
        raise ValueError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    bpp = 1 if color_type == 0 else 3
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, f = row[0], np.frombuffer(
            row[1:], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:
            cur = f
        elif ftype == 2:
            cur = (f + prev) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters need a sequential pass
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else b if pb <= pc else c
                    )
                cur[i] = (f[i] + pred) % 256
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, bpp)
    return arr[:, :, 0] if color_type == 0 else arr


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic choice — no
    resampling-kernel ambiguity across platforms)."""
    h, w = arr.shape[0], arr.shape[1]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]


from conversadocs_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)
