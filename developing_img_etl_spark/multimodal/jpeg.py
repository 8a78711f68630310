"""Stdlib+numpy baseline JPEG codec — the reference's ACTUAL corpus
format, decode → resize → encode, with zero third-party codec
dependencies.

The reference pipeline is cv2 JPEG decode / resize / re-encode at
quality 65 (/root/reference/test.py:44-59) over baseline SOF0 4:2:0
photos (648×490, verified against the fixture corpus). The BMP (m12),
PNG (m14) and GIF (m17) codecs made raster, DEFLATE and dictionary
compression real in-container; this module completes the set with the
transform-coded format the reference actually stores: full baseline
JFIF — Huffman entropy coding, zigzag RLE, quantized 8×8 DCT, YCbCr
color, 4:2:0/4:2:2/4:4:4 sampling — implemented from the public JPEG
specification (ITU-T T.81: Annex K tables, canonical Huffman, the
IJG quality→quant-table scaling formula).

Decoder supports: baseline sequential DCT (SOF0), 8-bit precision,
1 or 3 components, sampling factors 1 or 2, restart intervals.
Progressive (SOF2), arithmetic coding, 12-bit, >2 sampling factors
return None — the caller's PIL seam (multimodal/image.py) may pick
those up where importable; nothing is ever misread.

Encoder emits: JFIF baseline, 4:4:4 (no chroma loss beyond
quantization), standard Annex K Huffman tables, quality via the IJG
scaling curve — deterministic bytes for fixed pixels, so encoded
output is stable across runs/partitions.

Entropy coding is per-symbol Python over a peek-16 LUT (decode) and a
dict-coded bit writer (encode); DCT/IDCT, color transforms, sampling
and quantization are vectorized numpy over all blocks at once. In the
engine this runs inside Arrow-batched pandas UDFs (mapInPandas), so
the per-image cost parallelizes across executors exactly like the
real libjpeg path a deployment would plug into the same seam.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Spec constants (ITU-T T.81 public standard)
# --------------------------------------------------------------------------

# zigzag scan order: ZIGZAG[k] = natural (row-major) index of the k-th
# zigzag position
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 base quantization tables (natural order)
_BASE_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_BASE_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3-K.6 standard Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Decompression-bomb cap. Tighter than png.py's 90 MP because this
# decoder's PERSISTENT per-pixel footprint is larger: int32 coefficient
# grids (4 B) + float64 plane (8 B) per component ≈ 36 B/pixel for
# 4:4:4 color vs PNG's ~4 B — 24 MP bounds the decode at ~0.9 GB while
# still covering any sane photo corpus (the IDCT temporaries are
# chunk-bounded separately, see _decode_scan).
_MAX_PIXELS = 24_000_000

# orthonormal DCT-II basis: _DCT_M[u, x] = a(u) cos((2x+1)uπ/16)
_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """(luma, chroma) quant tables at the IJG quality scaling."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def _scaled(base: np.ndarray) -> np.ndarray:
        return np.clip((base * scale + 50) // 100, 1, 255)
    return _scaled(_BASE_Q_LUMA), _scaled(_BASE_Q_CHROMA)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical Huffman spec."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """Peek-16 decode LUT: lut[prefix16] = (symbol << 5) | code_length,
    or -1 for invalid prefixes. One table lookup per decoded symbol."""
    lut = np.full(1 << 16, -1, dtype=np.int32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (16 - ln)
            lut[base : base + (1 << (16 - ln))] = (vals[k] << 5) | ln
            code += 1
            k += 1
        code <<= 1
    return lut


# --------------------------------------------------------------------------
# Header-level metadata
# --------------------------------------------------------------------------
def jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOFn marker; header-only."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h = struct.unpack(">H", data[i + 5 : i + 7])[0]
            w = struct.unpack(">H", data[i + 7 : i + 9])[0]
            if w <= 0 or h <= 0:
                return None
            return (w, h)
        if marker == 0xDA:
            return None
        i += 2 + seg_len
    return None


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------
def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int] | None:
    """Destuff the entropy-coded scan from ``start``; split at RST
    markers. Returns (segments, pos_after_scan)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, i


def jpeg_decode(data: bytes) -> np.ndarray | None:
    """Baseline JPEG -> (h, w, 3) uint8 RGB, or None if unsupported or
    structurally broken. Never raises on hostile bytes."""
    try:
        return _decode_inner(bytes(data))
    except Exception:  # noqa: BLE001 — per-record guard, corrupt bytes → None
        return None


def _decode_inner(data: bytes) -> np.ndarray | None:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], np.ndarray] = {}
    frame = None  # (w, h, comps) with comps = [(cid, hi, vi, tq)]
    restart = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:  # 16-bit tables: out of baseline scope
                    return None
                if p + 65 > len(seg):
                    return None
                qt[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                if len(vals) < nv:
                    return None
                huff[(tc, th)] = _decode_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec = seg[0]
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            nc = seg[5]
            if prec != 8 or nc not in (1, 3) or w <= 0 or h <= 0:
                return None
            if w * h > _MAX_PIXELS:
                return None
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                hi, vi = hv >> 4, hv & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    return None
                comps.append((cid, hi, vi, seg[8 + 3 * c]))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15
                scomp.append((cs, td, ta))
            segs, _ = _split_scan(data, i + 2 + seg_len)
            return _decode_scan(frame, scomp, qt, huff, restart, segs)
        i += 2 + seg_len
    return None


def _decode_scan(frame, scomp, qt, huff, restart, segs) -> np.ndarray | None:
    w, h, comps = frame
    if len(scomp) != len(comps):
        return None
    if len(comps) == 1:
        # T.81 §A.2.2: an Ns=1 scan is NON-INTERLEAVED — the MCU is a
        # single data unit and blocks come in the component's own
        # raster order, regardless of declared sampling factors (which
        # only govern interleaving/subsampling BETWEEN components).
        # Normalizing the lone component to 1x1 makes the interleaved
        # MCU walk below degenerate to exactly that raster order.
        cid, _hi, _vi, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient grids in MCU-padded block units
    grids = []
    tables = []
    for (cid, hi, vi, tq), (scs, td, ta) in zip(comps, scomp):
        if scs != cid or tq not in qt or (0, td) not in huff or (1, ta) not in huff:
            return None
        # int32 grids: baseline coefficients fit in 16 bits; int32
        # halves the footprint of the naive int64 choice (bomb-cap math
        # below assumes this)
        grids.append(np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32))
        tables.append((huff[(0, td)], huff[(1, ta)], qt[tq]))

    # Tight inlined entropy walk (r12, guide §1.2 per-task work): the
    # method-call _BitReader/_decode_block shape spent ~70% of decode
    # in Python call overhead (981k calls for a 648x490 photo). Here
    # the bit reader lives in local variables, the peek-16 LUTs are
    # plain lists, and coefficients accumulate as (block, k, value)
    # triplets scattered into the int32 grids with ONE numpy assignment
    # per component — behavior (including None on corrupt streams) is
    # unchanged and pinned by the parity suite in tests/test_jpeg.py.
    n_mcu = mcux * mcuy
    per_seg = restart if restart else n_mcu
    luts = [(t[0].tolist(), t[1].tolist()) for t in tables]
    # flat (bi, k, v) triplets per component
    tri_b: list[list[int]] = [[] for _ in comps]
    tri_k: list[list[int]] = [[] for _ in comps]
    tri_v: list[list[int]] = [[] for _ in comps]
    comp_geo = [
        (ci, hi, vi, mcux * hi) for ci, (cid, hi, vi, tq) in enumerate(comps)
    ]
    mcu = 0
    for seg in segs:
        if mcu >= n_mcu:
            break
        data, ld, pos, acc, nb = seg, len(seg), 0, 0, 0
        preds = [0] * len(comps)
        end = min(mcu + per_seg, n_mcu)
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for ci, hi, vi, rowblocks in comp_geo:
                dc_lut, ac_lut = luts[ci]
                tb, tk, tv = tri_b[ci], tri_k[ci], tri_v[ci]
                pred = preds[ci]
                for by in range(vi):
                    bi0 = (my * vi + by) * rowblocks + mx * hi
                    for bx in range(hi):
                        bi = bi0 + bx
                        # --- DC ---
                        if nb < 16:
                            while nb <= 24:
                                if pos < ld:
                                    acc = (acc << 8) | data[pos]
                                    pos += 1
                                else:
                                    acc = (acc << 8) | 0xFF
                                nb += 8
                        t = dc_lut[(acc >> (nb - 16)) & 0xFFFF]
                        if t < 0:
                            return None
                        nb -= t & 31
                        acc &= (1 << nb) - 1
                        s = t >> 5
                        if s:
                            if nb < s:
                                while nb <= 24:
                                    if pos < ld:
                                        acc = (acc << 8) | data[pos]
                                        pos += 1
                                    else:
                                        acc = (acc << 8) | 0xFF
                                    nb += 8
                            v = (acc >> (nb - s)) & ((1 << s) - 1)
                            nb -= s
                            acc &= (1 << nb) - 1
                            pred += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                        tb.append(bi)
                        tk.append(0)
                        tv.append(pred)
                        # --- AC ---
                        k = 1
                        while k < 64:
                            if nb < 16:
                                while nb <= 24:
                                    if pos < ld:
                                        acc = (acc << 8) | data[pos]
                                        pos += 1
                                    else:
                                        acc = (acc << 8) | 0xFF
                                    nb += 8
                            t = ac_lut[(acc >> (nb - 16)) & 0xFFFF]
                            if t < 0:
                                return None
                            nb -= t & 31
                            acc &= (1 << nb) - 1
                            rs = t >> 5
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            if nb < s:
                                while nb <= 24:
                                    if pos < ld:
                                        acc = (acc << 8) | data[pos]
                                        pos += 1
                                    else:
                                        acc = (acc << 8) | 0xFF
                                    nb += 8
                            v = (acc >> (nb - s)) & ((1 << s) - 1)
                            nb -= s
                            acc &= (1 << nb) - 1
                            tb.append(bi)
                            tk.append(k)
                            tv.append(v if v >= (1 << (s - 1)) else v - (1 << s) + 1)
                            k += 1
                preds[ci] = pred
            mcu += 1
    if mcu < n_mcu:
        return None
    for ci in range(len(comps)):
        if tri_b[ci]:
            grids[ci].reshape(-1, 64)[tri_b[ci], tri_k[ci]] = tri_v[ci]

    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        _, _, q = tables[ci]
        grid = grids[ci]
        by, bx, _ = grid.shape
        n_blk = by * bx
        # dequant + de-zigzag + IDCT in bounded CHUNKS: the float64
        # einsum temporaries are ~24 B/pixel, so chunking keeps the
        # transient peak at ~8 MB regardless of image size (the
        # _MAX_PIXELS cap then only has to budget the persistent
        # int32 grid + float64 plane, ~12 B/pixel/component).
        pix = np.empty((n_blk, 8, 8), dtype=np.float64)
        zz = grid.reshape(n_blk, 64)
        for lo in range(0, n_blk, 4096):
            hi_ = min(lo + 4096, n_blk)
            coeffs = zz[lo:hi_].astype(np.int64) * q[None, :]
            nat = np.zeros_like(coeffs)
            nat[:, ZIGZAG] = coeffs  # de-zigzag
            blocks = nat.reshape(-1, 8, 8).astype(np.float64)
            pix[lo:hi_] = _batched_8x8(blocks, _DCT_M.T, _DCT_M) + 128.0
        plane = (
            pix.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # crop to the component's own resolution, then upsample
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        plane = plane[:ch, :cw]
        if hi != hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi != vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (4:4:4 baseline JFIF)
# --------------------------------------------------------------------------
class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane → (n_blocks, 8, 8), edge-padded to 8-multiples."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _batched_8x8(blocks: np.ndarray, left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """left @ B @ right for every 8x8 block, as two flat (n*8, 8) GEMMs
    instead of a naive einsum contraction (~10x on large planes; the
    per-coefficient dot products are the same 8-term sums, only their
    association order differs — all consumers gate on thresholded
    fidelity, never on exact float identity)."""
    n = blocks.shape[0]
    c = (blocks.reshape(n * 8, 8) @ right).reshape(n, 8, 8)
    d = (c.transpose(0, 2, 1).reshape(n * 8, 8) @ left.T).reshape(n, 8, 8)
    return d.transpose(0, 2, 1)


def _encode_plane_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Level-shift, forward DCT, quantize, zigzag: (n, 64) int coeffs."""
    blocks = _blocks_of(plane.astype(np.float64) - 128.0)
    freq = _batched_8x8(blocks, _DCT_M, _DCT_M.T)
    nat = freq.reshape(-1, 64)
    qnat = nat[:, ZIGZAG]  # to zigzag order first, q is kept in zigzag
    return np.round(qnat / q[None, :]).astype(np.int64)


def _emit_block(zz: np.ndarray, pred: int, dc_codes, ac_codes, bw: _BitWriter) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    bw.write(*dc_codes[s])
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])
            run -= 16
        s = abs(v).bit_length()
        bw.write(*ac_codes[(run << 4) | s])
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.write(*ac_codes[0x00])  # EOB
    return dc


def _code_arrays(codes: dict[int, tuple[int, int]], size: int) -> tuple[np.ndarray, np.ndarray]:
    """Dict symbol -> (code, len) as two dense lookup arrays; absent
    symbols get length 0 (checked at emit time — the scalar path would
    KeyError on them, the vector path raises ValueError)."""
    c = np.zeros(size, dtype=np.int64)
    ln = np.zeros(size, dtype=np.int64)
    for sym, (code, length) in codes.items():
        c[sym] = code
        ln[sym] = length
    return c, ln


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Vectorized int bit_length for |v| < 2^52: frexp's exponent is
    exactly floor(log2(v)) + 1 for v > 0 and 0 for v == 0 (values this
    small are exact in float64, so no boundary rounding)."""
    return np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)


def _entropy_encode(coeffs: list[np.ndarray], tabs) -> bytes:
    """Vectorized baseline entropy coder: same symbol stream, same
    canonical codes, same MCU interleave, stuffing and 1-padding as the
    scalar _emit_block/_BitWriter path — byte-identical output (pinned
    by tests), ~5x faster (the per-symbol Python loop was 80% of
    jpeg_encode; guide §4.2 — the heavy lifting belongs in vectorized
    native code inside the UDF).

    Every Huffman item (codeword or appended value bits) becomes one
    (code, nbits) pair with a (block, component, within-block) sort
    key; one lexsort recovers exact stream order and a bit-position
    scatter + packbits renders the stream."""
    all_codes: list[np.ndarray] = []
    all_lens: list[np.ndarray] = []
    all_blk: list[np.ndarray] = []
    all_comp: list[np.ndarray] = []
    all_key: list[np.ndarray] = []

    def _push(ci: int, blk: np.ndarray, key: np.ndarray, code: np.ndarray, ln: np.ndarray) -> None:
        all_codes.append(code)
        all_lens.append(ln)
        all_blk.append(blk)
        all_comp.append(np.full(len(blk), ci, dtype=np.int64))
        all_key.append(key)

    for ci, Z in enumerate(coeffs):
        n = Z.shape[0]
        (dc_c, dc_l), (ac_c, ac_l) = tabs[ci]
        # --- DC: diff vs previous block of the SAME component ---
        dc = Z[:, 0].astype(np.int64)
        diff = np.diff(dc, prepend=np.int64(0))
        s = _bit_length(diff)
        if int(s.max(initial=0)) >= len(dc_l) or (dc_l[s] == 0).any():
            raise ValueError("jpeg_encode: DC magnitude outside table")
        blks = np.arange(n, dtype=np.int64)
        _push(ci, blks, np.zeros(n, dtype=np.int64), dc_c[s], dc_l[s])
        has = s > 0
        v = np.where(diff > 0, diff, diff + np.left_shift(np.int64(1), s) - 1)
        _push(ci, blks[has], np.ones(int(has.sum()), dtype=np.int64), v[has], s[has])
        # --- AC: run-length over k = 1..last, ZRL for runs > 15 ---
        acs = Z[:, 1:]
        nzb, nzk0 = np.nonzero(acs)
        if len(nzb):
            k = nzk0.astype(np.int64) + 1
            prev = np.concatenate(([np.int64(0)], k[:-1]))
            same = np.concatenate(([False], nzb[1:] == nzb[:-1]))
            run = k - np.where(same, prev, 0) - 1
            zrl, rem = run // 16, run % 16
            av = acs[nzb, nzk0].astype(np.int64)
            sa = _bit_length(av)
            sym = (rem << 4) | sa
            if (ac_l[sym] == 0).any():
                raise ValueError("jpeg_encode: AC symbol outside table")
            # ZRL codes: j-th of a run sits just before its symbol
            zt = int(zrl.sum())
            if zt:
                zi = np.repeat(np.arange(len(zrl)), zrl)
                j = np.arange(zt, dtype=np.int64) - np.repeat(
                    np.concatenate(([0], np.cumsum(zrl)[:-1])), zrl
                )
                _push(ci, nzb[zi].astype(np.int64), k[zi] * 64 + j,
                      np.full(zt, ac_c[0xF0]), np.full(zt, ac_l[0xF0]))
            _push(ci, nzb.astype(np.int64), k * 64 + 16, ac_c[sym], ac_l[sym])
            va = np.where(av > 0, av, av + np.left_shift(np.int64(1), sa) - 1)
            _push(ci, nzb.astype(np.int64), k * 64 + 17, va, sa)
            last = np.zeros(n, dtype=np.int64)
            last[nzb] = k  # ascending k per block: final write is the max
        else:
            last = np.zeros(n, dtype=np.int64)
        eob = np.nonzero(last < 63)[0].astype(np.int64)
        _push(ci, eob, np.full(len(eob), 64 * 64, dtype=np.int64),
              np.full(len(eob), ac_c[0x00]), np.full(len(eob), ac_l[0x00]))

    codes = np.concatenate(all_codes)
    lens = np.concatenate(all_lens)
    order = np.lexsort(
        (np.concatenate(all_key), np.concatenate(all_comp), np.concatenate(all_blk))
    )
    codes, lens = codes[order], lens[order]

    ends = np.cumsum(lens)
    starts = ends - lens
    total = int(ends[-1]) if len(ends) else 0
    pad = (-total) % 8
    bits = np.zeros(total + pad, dtype=np.uint8)
    for bp in range(int(lens.max(initial=0))):
        sel = lens > bp
        bits[ends[sel] - 1 - bp] = (codes[sel] >> bp) & 1
    bits[total:] = 1  # flush pads with 1s
    by = np.packbits(bits)
    ff = np.nonzero(by == 0xFF)[0]
    if len(ff):
        by = np.insert(by, ff + 1, 0)  # byte stuffing
    return by.tobytes()


def jpeg_encode(arr: np.ndarray, quality: int = 65) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4, Annex K
    Huffman, IJG quality scaling). Deterministic for fixed input."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, _ = arr.shape
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError("jpeg_encode: dims out of range")
    ql, qc = quant_tables(quality)
    # zigzag-ordered tables are what DQT stores and what the
    # quantizer divides by (coeffs are zigzagged before quantization)
    ql_z, qc_z = ql[ZIGZAG], qc[ZIGZAG]

    rgb = arr.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    coeffs = [
        _encode_plane_coeffs(y, ql_z),
        _encode_plane_coeffs(cb, qc_z),
        _encode_plane_coeffs(cr, qc_z),
    ]

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, ql_z), (1, qc_z)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in tbl
        )
    out += b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([3])
    out += bytes([1, 0x11, 0])  # Y: 1x1, qt 0
    out += bytes([2, 0x11, 1])  # Cb
    out += bytes([3, 0x11, 1])  # Cr
    for tc, th, (bits, vals) in (
        (0, 0, _DC_LUMA),
        (1, 0, _AC_LUMA),
        (0, 1, _DC_CHROMA),
        (1, 1, _AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes([3])
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    dc_la = _code_arrays(dc_l, 17)
    ac_la = _code_arrays(ac_l, 256)
    dc_ca = _code_arrays(dc_c, 17)
    ac_ca = _code_arrays(ac_c, 256)
    tabs = [(dc_la, ac_la), (dc_ca, ac_ca), (dc_ca, ac_ca)]
    out += _entropy_encode(coeffs, tabs)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _entropy_encode_scalar(coeffs: list[np.ndarray], dicts) -> bytes:
    """The original per-symbol reference path (_emit_block/_BitWriter),
    kept as the parity oracle for _entropy_encode: the vectorized coder
    must produce byte-identical streams (tests/test_multimodal_codecs)."""
    bw = _BitWriter()
    preds = [0, 0, 0]
    for i in range(coeffs[0].shape[0]):  # 4:4:4 → one block/component/MCU
        for ci in range(3):
            preds[ci] = _emit_block(coeffs[ci][i], preds[ci], *dicts[ci], bw)
    bw.flush()
    return bytes(bw.out)


def make_photo(width: int, height: int, seed: int = 0) -> np.ndarray:
    """Deterministic gradient test pixels — the same per-channel
    arithmetic the PNG/BMP corpora use (oracle-replayable)."""
    xs = np.arange(width, dtype=np.int64)[None, :]
    ys = np.arange(height, dtype=np.int64)[:, None]
    r = (seed * 29 + xs + ys) % 256
    g = (seed * 11 + xs * 3 + ys * 5) % 256
    b = (seed + xs * 7 + ys * 13) % 256
    return np.stack(
        [np.broadcast_to(c, (height, width)) for c in (r, g, b)], axis=2
    ).astype(np.uint8)
