"""Stdlib GIF codec (GIF89a, LZW) — the third real image format after
BMP (uncompressed raster, bmp.py) and PNG (DEFLATE, png.py), adding the
remaining classic compression family: dictionary coding. Everything is
hand-rolled from the public GIF89a specification — variable-width
LSB-first LZW codes, clear/EOI codes, 4096-entry dictionary reset,
255-byte data sub-blocks — so a palette-indexed *compressed* format
runs decode → resize → re-encode in-container with zero dependencies.

Scope (deliberate, guard-not-wrong-answer): single-image,
non-interlaced GIFs with a global or local color table; animations,
interlace, and transparency return None (the M3 unreadable guard) —
PIL handles them where importable, exactly like exotic PNG shapes.

Decoded pixels are (h, w, 3) uint8 RGB (palette storage order). GIF is
lossless for images of ≤256 distinct colors, so decode(encode(x))
round-trips bit-exactly on palette-sized inputs — encode raises on
more than 256 distinct colors rather than silently quantizing.
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER = b"GIF89a"
_MAX_CODE_BITS = 12


def gif_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the logical screen descriptor; None if not
    a structurally-plausible GIF (the M2 metadata path). Beyond the
    magic, the global color table (if flagged) must fit and the first
    block introducer after it must be a legal one (extension, image
    descriptor, or trailer) — otherwise junk like b"GIF89acorrupt"
    would read its own tail as screen dimensions."""
    if len(data) < 13 or data[:3] != b"GIF" or data[3:6] not in (b"87a", b"89a"):
        return None
    w, h = struct.unpack_from("<HH", data, 6)
    if w <= 0 or h <= 0:
        return None
    pos = 13
    if data[10] & 0x80:
        pos += 3 * (2 << (data[10] & 0x07))
    if pos >= len(data) or data[pos] not in (0x21, 0x2C, 0x3B):
        return None
    return (w, h)


# --------------------------------------------------------------------------
# LZW (GIF variant): variable code width starting at min_code_size+1,
# LSB-first bit packing, CLEAR = 2^min, EOI = CLEAR+1, dict capped at
# 4096 entries (12-bit codes).
# --------------------------------------------------------------------------
def _lzw_decode(min_code_size: int, data: bytes) -> bytearray | None:
    """LZW decode with the table stored as (start, len) SPANS into the
    output buffer (r8): every multi-byte entry the decoder can ever
    reference is already a contiguous substring of what it has written
    (entry k = previous output + first byte of the output that followed
    it), so table entries need no byte storage at all — emitting is one
    ``out += out[s:s+l]`` slice and the per-code bytes-concat allocs of
    the previous list-of-bytes table are gone. Byte-for-byte the same
    decoded stream (round-trip property tests + m17 hash)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    max_table = 1 << _MAX_CODE_BITS
    code_size = min_code_size + 1
    starts = [0] * max_table
    lens = [0] * max_table
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev_start = 0
    prev_len = 0  # 0 ⇔ no previous entry (start of stream / after clear)
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                next_code = eoi + 1
                code_size = min_code_size + 1
                prev_len = 0
                continue
            if code == eoi:
                return out
            cur_start = len(out)
            if code < clear:
                out.append(code)
                cur_len = 1
            elif eoi < code < next_code:
                s, cur_len = starts[code], lens[code]
                out += out[s : s + cur_len]
            elif code == next_code and prev_len:
                # the cScSc case: prev + prev[0]
                out += out[prev_start : prev_start + prev_len]
                out.append(out[prev_start])
                cur_len = prev_len + 1
            else:
                return None  # corrupt stream
            if prev_len and next_code < max_table:
                # new entry = prev + cur[0]; prev sits at prev_start and
                # cur[0] is the byte right after it — one contiguous span
                starts[next_code] = prev_start
                lens[next_code] = prev_len + 1
                next_code += 1
            if next_code == (1 << code_size) and code_size < _MAX_CODE_BITS:
                code_size += 1
            prev_start, prev_len = cur_start, cur_len
    return out  # stream ended without EOI: tolerate (common in the wild)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Greedy LZW over a (prefix_code, next_byte) -> code trie.

    r8 rework (VERDICT r7 #4): the original kept the dictionary keyed
    by the match BYTESTRING and rebuilt ``run + bytes([b])`` on every
    input byte — O(match_len) allocation per step, quadratic over long
    matches, the m17 sf10 bottleneck (93 s vs DuckDB's 9 s). The trie
    keyed on int pairs is the textbook O(1)-per-byte formulation and
    emits the BYTE-IDENTICAL code stream (a string in the old table
    ≡ the trie path of its codes), verified by the round-trip property
    tests. Bit-packing moved from per-input-byte to per-emitted-code.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    max_table = 1 << _MAX_CODE_BITS
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[int, int] = {}  # key = prev_code << 8 | next_byte
    next_code = eoi + 1
    emit(clear)
    if indices:
        cur = indices[0]
        for b in indices[1:]:
            nxt = table.get((cur << 8) | b)
            if nxt is not None:
                cur = nxt
                continue
            emit(cur)
            # GIF width rule: grow when the NEXT assigned code no
            # longer fits
            if next_code < max_table:
                table[(cur << 8) | b] = next_code
                if next_code == (1 << code_size) and code_size < _MAX_CODE_BITS:
                    code_size += 1
                next_code += 1
            else:  # dictionary full: reset (matches mainstream encoders)
                emit(clear)
                table.clear()
                next_code = eoi + 1
                code_size = min_code_size + 1
            cur = b
        emit(cur)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytearray, int] | None:
    """Concatenate 255-byte-max data sub-blocks starting at pos; returns
    (data, offset past the 0 terminator) or None if truncated."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            return None
        size = data[pos]
        pos += 1
        if size == 0:
            return out, pos
        if pos + size > n:
            return None
        out += data[pos : pos + size]
        pos += size


def gif_decode(data: bytes) -> np.ndarray | None:
    """Single-image non-interlaced GIF → (h, w, 3) uint8 RGB; None for
    anything else (the M3 guard)."""
    if gif_dims(data) is None or len(data) < 13:
        return None
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            return None
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    screen_w, screen_h = struct.unpack_from("<HH", data, 6)
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(data):
                return None
            label = data[pos + 1]
            if label == 0xFF:  # application ext (NETSCAPE loop): animation
                return None
            sub = _read_sub_blocks(data, pos + 2)
            if sub is None:
                return None
            if label == 0xF9 and len(sub[0]) >= 1 and sub[0][0] & 0x01:
                return None  # transparent color flagged: out of scope, guard
            pos = sub[1]
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                return None
            left, top, w, h = struct.unpack_from("<HHHH", data, pos + 1)
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x40:  # interlaced: out of scope, guard
                return None
            if (left, top) != (0, 0) or (w, h) != (screen_w, screen_h):
                # sub-rectangle frame (optimizer output): decoding it as
                # the full screen would be a WRONG answer — guard instead
                return None
            table = gct
            if ipacked & 0x80:  # local color table wins
                n = 2 << (ipacked & 0x07)
                if pos + 3 * n > len(data):
                    return None
                table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if table is None or pos >= len(data) or w <= 0 or h <= 0:
                return None
            min_code_size = data[pos]
            if not 2 <= min_code_size <= 11:
                return None
            sub = _read_sub_blocks(data, pos + 1)
            if sub is None:
                return None
            indices = _lzw_decode(min_code_size, bytes(sub[0]))
            if indices is None or len(indices) < w * h:
                return None
            idx = np.frombuffer(bytes(indices[: w * h]), np.uint8).reshape(h, w)
            if idx.max(initial=0) >= len(table):
                return None
            # single-image contract: anything but extensions + trailer
            # after this frame means an animation — guard, don't return
            # a silently-truncated first frame
            pos = sub[1]
            while pos < len(data):
                tail = data[pos]
                if tail == 0x3B:
                    break
                if tail != 0x21 or pos + 2 > len(data):
                    return None
                rest = _read_sub_blocks(data, pos + 2)
                if rest is None:
                    return None
                pos = rest[1]
            return np.ascontiguousarray(table[idx])
        elif block == 0x3B:  # trailer before any image
            return None
        else:
            return None
    return None


def gif_encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB with ≤256 distinct colors → GIF89a with a
    deterministic (lexicographically sorted) global color table."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"gif_encode expects (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    # one int32 key per pixel; np.unique on the keys is a single flat
    # sort and its order IS the lexicographic RGB order, so the palette
    # derived from it is identical to np.unique(flat, axis=0) (which
    # paid a second void-view sort) — r8 m17 hot-path trim
    keys = flat[:, 0].astype(np.int32) * 65536 + flat[:, 1].astype(np.int32) * 256 + flat[:, 2]
    pal_keys, indices8 = np.unique(keys, return_inverse=True)
    if len(pal_keys) > 256:
        raise ValueError(f"gif_encode: {len(pal_keys)} distinct colors > 256 (quantize first)")
    palette = np.stack(
        [pal_keys >> 16, (pal_keys >> 8) & 0xFF, pal_keys & 0xFF], axis=1
    ).astype(np.uint8)
    indices = indices8.astype(np.uint8).tobytes()
    # GCT size: smallest 2^(k+1) >= max(len(palette), 2); min_code_size >= 2
    k = 0
    while (2 << k) < max(len(palette), 2):
        k += 1
    table_n = 2 << k
    gct = np.zeros((table_n, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    min_code_size = max(k + 1, 2)
    lzw = _lzw_encode(min_code_size, indices)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return b"".join(
        [
            _HEADER,
            struct.pack("<HHBBB", w, h, 0xF0 | k, 0, 0),  # GCT flag + 8-bit res + size
            gct.tobytes(),
            b"\x2c",
            struct.pack("<HHHHB", 0, 0, w, h, 0),
            bytes([min_code_size]),
            bytes(blocks),
            b"\x3b",
        ]
    )


def make_gif(width: int, height: int, seed: int = 0, n_colors: int = 64) -> bytes:
    """Deterministic palette-indexed test image: pixel (x, y) uses
    palette slot c = (x*7 + y*13 + seed) % n_colors with RGB =
    ((c*3 + 11) % 256, (c*5 + 1) % 256, (c*7 + 3) % 256) — every byte a
    pure function of (w, h, seed), replayable in SQL."""
    if not 2 <= n_colors <= 256:
        raise ValueError(f"n_colors must be in [2, 256], got {n_colors}")
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    c = (x * 7 + y * 13 + seed) % n_colors
    rgb = np.stack([(c * 3 + 11) % 256, (c * 5 + 1) % 256, (c * 7 + 3) % 256], axis=2)
    return gif_encode(rgb.astype(np.uint8))
