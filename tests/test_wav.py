"""RIFF/WAV codec (multimodal/wav.py) — bit-exact round trip, stdlib
`wave`-module cross-check (both directions), chunk-walk robustness, and
the unreadable guard. No Spark needed: pure codec units (the Spark-side
plumbing is covered by the m16 oracle query in test_oracle_queries)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from developing_img_etl_spark.multimodal.wav import (
    HEADER_SIZE,
    make_wav,
    resample_nearest,
    wav_decode,
    wav_encode,
    wav_meta,
)


def test_round_trip_bit_exact():
    samples = np.array([0, 1, -1, 32767, -32768, 1000], dtype=np.int16)
    data = wav_encode(44100, samples)
    assert len(data) == HEADER_SIZE + 2 * len(samples)
    rate, channels, out = wav_decode(data)
    assert (rate, channels) == (44100, 1)
    assert np.array_equal(out, samples)
    # re-encode is byte-identical (lossless canonical form)
    assert wav_encode(rate, out) == data


def test_stdlib_wave_reads_our_encode():
    samples = ((np.arange(500) * 17) % 2048 - 1024).astype(np.int16)
    data = wav_encode(16000, samples)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 500
        frames = np.frombuffer(w.readframes(500), dtype="<i2")
    assert np.array_equal(frames, samples)


def test_our_decode_reads_stdlib_wave():
    samples = np.array([5, -5, 100, -100, 0], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    rate, channels, out = wav_decode(buf.getvalue())
    assert (rate, channels) == (8000, 1)
    assert np.array_equal(out, samples)


def test_chunk_walk_skips_unknown_and_odd_chunks():
    base = wav_encode(8000, np.array([1, 2, 3], dtype=np.int16))
    fmt_chunk = base[12:36]  # "fmt " + size + 16-byte payload
    data_chunk = base[36:]
    junk_odd = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size, padded
    list_chunk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = fmt_chunk + junk_odd + list_chunk + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, channels, out = wav_decode(rebuilt)
    assert (rate, channels) == (8000, 1)
    assert np.array_equal(out, np.array([1, 2, 3], dtype=np.int16))


def test_unreadable_guard():
    good = wav_encode(8000, np.array([1, 2, 3, 4], dtype=np.int16))
    assert wav_decode(b"RIFFjunk") is None  # the m16 corrupt seed
    assert wav_decode(good[:20]) is None  # truncated mid-chunk
    assert wav_decode(good[:-3]) is None  # truncated data payload
    assert wav_decode(b"") is None and wav_decode(b"OggS\x00") is None
    # IEEE-float format tag (3) — rejected, not misread
    float_tag = bytearray(good)
    struct.pack_into("<H", float_tag, 20, 3)
    assert wav_decode(bytes(float_tag)) is None
    # 8-bit — rejected
    eight = bytearray(good)
    struct.pack_into("<H", eight, 34, 8)
    assert wav_decode(bytes(eight)) is None
    # data chunk before fmt — structurally invalid
    swapped = good[:12] + good[36:] + good[12:36]
    assert wav_decode(swapped) is None


def test_stereo_decodes_with_channel_count():
    frames = np.array([1, 2, 3, 4], dtype=np.int16)  # 2 frames x 2 channels
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(frames.tobytes())
    rate, channels, out = wav_decode(buf.getvalue())
    assert (rate, channels) == (22050, 2)
    assert np.array_equal(out, frames)
    assert wav_meta(buf.getvalue()) == (22050, 2)  # frames, not samples


def test_resample_integer_gather():
    s = np.arange(100, dtype=np.int16)
    q = resample_nearest(s, 25)
    assert np.array_equal(q, np.array([(j * 100) // 25 for j in range(25)], dtype=np.int16))
    assert np.array_equal(resample_nearest(s, 100), s)  # identity
    assert resample_nearest(s, 1).tolist() == [0]
    with pytest.raises(ValueError):
        resample_nearest(s, 0)


def test_make_wav_formula_matches_oracle_arithmetic():
    data = make_wav(8000, 50, seed=7)
    rate, channels, s = wav_decode(data)
    assert (rate, channels, len(s)) == (8000, 1, 50)
    expect = [((7 * 31 + i * 17) % 2048) - 1024 for i in range(50)]
    assert s.tolist() == expect


def test_av_metadata_routes_real_wav():
    from developing_img_etl_spark.multimodal.av import _decode_audio_meta

    assert _decode_audio_meta(make_wav(16000, 123)) == (16000, 123)
    assert _decode_audio_meta(b"RIFFjunk") is None
    assert _decode_audio_meta(b"FAKEAUD:8000:10:aaaaaaaaaa") == (8000, 10)
