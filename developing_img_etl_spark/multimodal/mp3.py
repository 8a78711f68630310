"""MPEG-1 Audio Layer III (MP3) frame-header walker + deterministic
CBR generator — pure stdlib, no codec dependencies.

Public spec: ISO/IEC 11172-3 frame header layout (the 4-byte header:
11-bit sync, version, layer, bitrate index, sample-rate index, padding
bit) and the Layer III frame-length formula
``144 * bitrate / sample_rate + padding``; the ID3v2.3 tag prefix
("ID3" + version + flags + 28-bit syncsafe size) is skipped per the
id3.org spec. Reference parity: the reference pipeline has no audio
container surface (its media handling is image-only via cv2,
/root/reference/test.py); this extends the mandated multimodal tier
the same way wav.py/avi.py/mov.py/fmp4.py/mkv.py do — audio container
family #2 (MPEG elementary stream) beside RIFF/WAVE.

Scope: MPEG-1 Layer III CBR without CRC, mono — the fixed-size-frame
core of the format. The walker is STRICT: any malformed header or a
frame length overrunning EOF → abstain (None), the M3 unreadable-guard
discipline (never a silently-wrong count).
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (index -> kbps); index 0 is "free",
# 15 is forbidden — both rejected by the walker.
BITRATE_KBPS = {
    1: 32, 2: 40, 3: 48, 4: 56, 5: 64, 6: 80, 7: 96, 8: 112,
    9: 128, 10: 160, 11: 192, 12: 224, 13: 256, 14: 320,
}
# MPEG-1 sample-rate table (2-bit index; 3 is reserved)
SAMPLE_RATE = {0: 44100, 1: 48000, 2: 32000}
SAMPLES_PER_FRAME = 1152  # Layer III, MPEG-1


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """ISO 11172-3 Layer III: floor(144 * bitrate / sample_rate) + pad."""
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def _syncsafe(n: int) -> bytes:
    """ID3v2 28-bit syncsafe integer (7 bits per byte, MSB clear)."""
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def make_mp3(
    sr_idx: int,
    br_idx: int,
    n_frames: int,
    seed: int,
    *,
    with_id3: bool = False,
    id3_size: int = 0,
) -> bytes:
    """Deterministic CBR MPEG-1 Layer III stream: ``n_frames`` frames,
    per-frame padding bit = (frame_idx + seed) % 2, payload bytes a
    seeded counter pattern. Optionally prefixed with an ID3v2.3 tag of
    ``id3_size`` payload bytes (walker must skip 10 + id3_size)."""
    sr = SAMPLE_RATE[sr_idx]
    br = BITRATE_KBPS[br_idx]
    out = bytearray()
    if with_id3:
        out += b"ID3" + bytes((3, 0, 0)) + _syncsafe(id3_size)
        out += bytes((seed + j) % 256 for j in range(id3_size))
    for i in range(n_frames):
        pad = (i + seed) % 2
        flen = frame_length(br, sr, pad)
        # header: sync(11) | version MPEG-1 (0b11) | layer III (0b01) |
        # no-CRC (1) -> 0xFF 0xFB; then bitrate idx, sr idx, padding;
        # then mono channel mode (0b11 << 6)
        out += bytes((0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1), 0xC0))
        out += bytes((seed * 7 + i * 13 + j) % 256 for j in range(flen - 4))
    return bytes(out)


def mp3_meta(data: bytes | None):
    """Walk the frame chain; return (sample_rate, bitrate_kbps,
    n_frames, duration_ms, has_id3, stream_bytes) or None (abstain) on
    any malformed/truncated structure. ``stream_bytes`` counts the
    audio frame bytes only (headers included, ID3 excluded); CBR is
    enforced — a mid-stream bitrate/sample-rate change abstains."""
    if not data or len(data) < 4:
        return None
    pos = 0
    has_id3 = False
    if data[:3] == b"ID3":
        if len(data) < 10:
            return None
        if any(b & 0x80 for b in data[6:10]):
            return None  # malformed syncsafe size
        size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        pos = 10 + size
        has_id3 = True
        if pos >= len(data):
            return None
    sr = br = None
    n = 0
    stream_bytes = 0
    while pos < len(data):
        if pos + 4 > len(data):
            return None  # trailing garbage shorter than a header
        b0, b1, b2 = data[pos], data[pos + 1], data[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            return None
        if (b1 >> 3) & 0x3 != 0x3 or (b1 >> 1) & 0x3 != 0x1:
            return None  # not MPEG-1 Layer III
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if br_idx not in BITRATE_KBPS or sr_idx not in SAMPLE_RATE:
            return None
        f_sr, f_br = SAMPLE_RATE[sr_idx], BITRATE_KBPS[br_idx]
        if sr is None:
            sr, br = f_sr, f_br
        elif (f_sr, f_br) != (sr, br):
            return None  # VBR / corrupt header — out of CBR scope
        flen = frame_length(f_br, f_sr, (b2 >> 1) & 0x1)
        if pos + flen > len(data):
            return None  # truncated mid-frame
        pos += flen
        stream_bytes += flen
        n += 1
    if n == 0:
        return None
    duration_ms = n * SAMPLES_PER_FRAME * 1000 // sr
    return (sr, br, n, duration_ms, has_id3, stream_bytes)
