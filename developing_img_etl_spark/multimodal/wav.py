"""Stdlib RIFF/WAV PCM audio codec — the audio analogue of bmp.py /
png.py: a REAL container format decoded, transformed, and re-encoded
in-container with zero dependencies beyond numpy.

Until now the audio path exercised only the FAKEAUD header seam
(av.py) because no audio library ships in the container; WAV (RIFF,
16-bit little-endian PCM) is simple enough to parse by hand — a chunk
walk over `RIFF`/`WAVE`, `fmt ` and `data` — and lossless, so
decode(encode(x)) round-trips bit-exactly and the stdlib `wave` module
provides an independent cross-check in tests. The reference's media
compute shape is decode → deterministic downscale → re-encode
(/root/reference/test.py:44-59 does the image analogue with cv2); the
audio mirror here is decode → nearest-neighbor resample → re-encode.

Layout notes (RIFF/WAVE spec, public): the file is `RIFF <size> WAVE`
followed by chunks, each `<4-byte id> <uint32 size> <payload>` with
odd-sized payloads padded to an even boundary. `fmt ` carries
(format_tag, channels, sample_rate, byte_rate, block_align,
bits_per_sample); `data` carries the interleaved PCM frames. The
decoder walks chunks in order (skipping LIST/INFO and any unknown
chunk), accepts only uncompressed PCM (format tag 1) at 16 bits, and
treats any structural violation — truncated chunk, missing fmt/data,
fmt after data, zero channels — as unreadable (the M3 guard: null,
never a wrong answer). The encoder always writes the minimal canonical
44-byte-header mono form, the most compatible shape.
"""

from __future__ import annotations

import struct

import numpy as np

HEADER_SIZE = 44  # RIFF(12) + "fmt "(8+16) + "data"(8) — the minimal canonical form


def wav_encode(sample_rate: int, samples: np.ndarray) -> bytes:
    """Mono 16-bit PCM samples (int16 array) → canonical 44-byte-header
    WAV. Output size is pure arithmetic — HEADER_SIZE + 2*n — so
    oracles can compute it in SQL."""
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim != 1:
        raise ValueError(f"wav_encode expects a 1-D sample array, got shape {samples.shape}")
    payload = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(payload)),
            payload,
        ]
    )


def wav_decode(data: bytes) -> tuple[int, int, np.ndarray] | None:
    """WAV bytes → (sample_rate, n_channels, int16 array of interleaved
    samples); None for anything unreadable or non-16-bit-PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt_info: tuple[int, int] | None = None  # (channels, sample_rate)
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + size > len(data):
            return None  # truncated chunk
        if cid == b"fmt ":
            if size < 16:
                return None
            tag, channels, rate, _byte_rate, _block, bits = struct.unpack_from(
                "<HHIIHH", data, body_start
            )
            if tag != 1 or bits != 16 or channels < 1 or rate < 1:
                return None  # compressed / float / exotic — unreadable here
            fmt_info = (channels, rate)
        elif cid == b"data":
            if fmt_info is None:
                return None  # data before fmt: structurally invalid
            channels, rate = fmt_info
            n_vals = size // 2
            samples = np.frombuffer(data, dtype="<i2", count=n_vals, offset=body_start)
            return (rate, channels, samples.copy())
        pos = body_start + size + (size & 1)  # odd payloads pad to even
    return None  # no data chunk


def wav_meta(data: bytes) -> tuple[int, int] | None:
    """(sample_rate, n_frames) from headers only — the M2-style metadata
    path; None if unreadable."""
    decoded = wav_decode(data)
    if decoded is None:
        return None
    rate, channels, samples = decoded
    return (rate, len(samples) // channels)


def resample_nearest(samples: np.ndarray, dst_n: int) -> np.ndarray:
    """Nearest-neighbor resample via PURE-INTEGER index gather:
    src_idx = (j * src_n) // dst_n — the audio mirror of bmp.nn_resize,
    but in exact integer arithmetic so oracles replay it in SQL with
    integer division, no FP truncation edge cases."""
    src_n = len(samples)
    if dst_n <= 0:
        raise ValueError(f"dst_n must be positive, got {dst_n}")
    if src_n == 0:
        return samples[:0]
    idx = (np.arange(dst_n, dtype=np.int64) * src_n) // dst_n
    return samples[idx]


def make_wav(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    """Deterministic synthetic PCM (integer sawtooth mixed with the
    seed) for tests and declared queries — every sample a pure function
    of (seed, i), replayable in SQL: ((seed*31 + i*17) % 2048) - 1024."""
    i = np.arange(n_samples, dtype=np.int64)
    samples = ((seed * 31 + i * 17) % 2048) - 1024
    return wav_encode(sample_rate, samples.astype(np.int16))
