"""Stdlib BMP raster codec — the engine's zero-dependency REAL pixel
path (closes the round-2 gap: resize/re-encode previously executed only
on the FAKEIMG seam because no codec library ships in the container).

BMP (Windows V3, BITMAPINFOHEADER, 24-bit uncompressed) is simple
enough to code with `struct` + numpy and lossless, so
decode(encode(x)) round-trips bit-exactly — which is what makes the
pipeline property-testable on real raster data. The reference's own
compute is decode → aspect-preserving downscale → re-encode
(/root/reference/test.py:44-59); with this codec that runs end-to-end
on actual pixels, not just the synthetic header format.

Layout notes (BMP spec, public): pixel rows are bottom-up unless the
height field is negative (top-down), each row padded to a 4-byte
boundary, channels stored BGR. The decoder normalizes to a top-down
(h, w, 3) uint8 array; the encoder always writes bottom-up positive
height with zero padding, the most compatible form.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER_SIZE = 14
_INFO_HEADER_SIZE = 40
_HEADER_SIZE = _FILE_HEADER_SIZE + _INFO_HEADER_SIZE


def bmp_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the BITMAPINFOHEADER; None if not a BMP we
    can read (header-only, no pixel decode — the M2 metadata path)."""
    if len(data) < _HEADER_SIZE or data[:2] != b"BM":
        return None
    dib = struct.unpack_from("<I", data, 14)[0]
    if dib < _INFO_HEADER_SIZE:  # BITMAPCOREHEADER etc. — not supported
        return None
    w, h = struct.unpack_from("<ii", data, 18)
    if w <= 0 or h == 0:
        return None
    return (w, abs(h))


def bmp_decode(data: bytes) -> np.ndarray | None:
    """24-bit uncompressed BMP → top-down (h, w, 3) uint8 BGR array;
    None for anything else (truncated, compressed, other bit depths)."""
    if len(data) < _HEADER_SIZE or data[:2] != b"BM":
        return None
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    dib = struct.unpack_from("<I", data, 14)[0]
    if dib < _INFO_HEADER_SIZE:
        return None
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if w <= 0 or h == 0 or bpp != 24 or compression != 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(data) < pixel_off + stride * h:
        return None
    buf = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = buf.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows)


def bmp_encode(arr: np.ndarray) -> bytes:
    """Top-down (h, w, 3) uint8 BGR array → 24-bit uncompressed BMP."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"bmp_encode expects (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1].reshape(h, w * 3)  # bottom-up rows
    pixels = body.tobytes()
    file_header = b"BM" + struct.pack("<IHHI", _HEADER_SIZE + len(pixels), 0, 0, _HEADER_SIZE)
    # 2835 ppm ≈ 72 DPI, the conventional default
    info_header = struct.pack(
        "<IiiHHIIiiII", _INFO_HEADER_SIZE, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def bmp_encoded_size(w: int, h: int) -> int:
    """Exact output byte size for a w×h 24-bit BMP — pure arithmetic,
    so oracles can compute it in SQL: 54 + row_stride(w) * h."""
    return _HEADER_SIZE + ((w * 3 + 3) & ~3) * h


def nn_resize(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index gather: source index =
    floor(dst * src/dst) — deterministic, no filtering, matching the
    reference's truncation-based arithmetic style."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(new_h) * (h / new_h)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(new_w) * (w / new_w)).astype(np.int64), w - 1)
    return np.ascontiguousarray(arr[ys][:, xs])


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic synthetic raster (gradient + seed mix) for tests
    and declared queries — every byte a pure function of (w, h, seed)."""
    y = np.arange(height, dtype=np.uint32)[:, None]
    x = np.arange(width, dtype=np.uint32)[None, :]
    b = (x * 7 + y * 13 + seed) % 256
    g = (x * 3 + y * 5 + seed * 11) % 256
    r = (x + y + seed * 29) % 256
    arr = np.stack([b, g, r], axis=2).astype(np.uint8)
    return bmp_encode(arr)
