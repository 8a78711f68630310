"""Property tests for the MP3 frame-chain walker (multimodal/mp3.py).

The oracle hash-match (m24) certifies the corpus grid end-to-end; these
pin the walker's spec behavior on shapes the grid can't reach —
truncation at every byte boundary, ID3 edge forms, malformed headers,
VBR rejection."""

from __future__ import annotations

import pytest

from developing_img_etl_spark.multimodal.mp3 import (
    BITRATE_KBPS,
    SAMPLE_RATE,
    frame_length,
    make_mp3,
    mp3_meta,
)


@pytest.mark.parametrize("sr_idx", sorted(SAMPLE_RATE))
@pytest.mark.parametrize("br_idx", [5, 9, 14])
def test_roundtrip_grid(sr_idx, br_idx):
    for n in (1, 4, 9):
        for seed in (0, 1, 17):
            data = make_mp3(sr_idx, br_idx, n, seed)
            meta = mp3_meta(data)
            assert meta is not None
            sr, br, nf, dur, has_id3, sbytes = meta
            assert (sr, br, nf) == (SAMPLE_RATE[sr_idx], BITRATE_KBPS[br_idx], n)
            assert dur == n * 1152 * 1000 // sr
            assert not has_id3
            assert sbytes == len(data)


def test_id3_skip_and_flag():
    data = make_mp3(1, 7, 3, 9, with_id3=True, id3_size=57)
    meta = mp3_meta(data)
    assert meta is not None and meta[4] is True
    # stream bytes exclude the 10 + 57 tag bytes
    assert meta[5] == len(data) - 67


def test_truncation_abstains_off_boundary():
    """Chopping a valid stream anywhere EXCEPT an exact frame boundary
    must abstain — a partial frame is never silently dropped. A cut at
    a frame boundary is indistinguishable from a legitimately shorter
    stream and must parse with the smaller count."""
    sr, br, seed = SAMPLE_RATE[0], BITRATE_KBPS[9], 4
    data = make_mp3(0, 9, 3, seed=seed)
    boundaries = {0}
    pos = 0
    for i in range(3):
        pos += frame_length(br, sr, (i + seed) % 2)
        boundaries.add(pos)
    for cut in range(1, len(data)):
        meta = mp3_meta(data[:cut])
        if cut in boundaries:
            assert meta is not None and meta[5] == cut
        else:
            assert meta is None, cut


def test_malformed_headers_abstain():
    good = make_mp3(2, 11, 2, seed=3)
    assert mp3_meta(b"junk" + good) is None  # lost sync at start
    bad_sync = bytearray(good)
    bad_sync[0] = 0xFE
    assert mp3_meta(bytes(bad_sync)) is None
    # forbidden bitrate index (15) in the first header
    bad_br = bytearray(good)
    bad_br[2] = (15 << 4) | (bad_br[2] & 0x0F)
    assert mp3_meta(bytes(bad_br)) is None
    # reserved sample-rate index (3)
    bad_sr = bytearray(good)
    bad_sr[2] = (bad_sr[2] & 0xF0) | (3 << 2) | (bad_sr[2] & 0x2)
    assert mp3_meta(bytes(bad_sr)) is None


def test_vbr_rejected():
    """CBR scope: concatenating two valid streams at different
    bitrates must abstain, not average."""
    a = make_mp3(0, 5, 2, seed=1)
    b = make_mp3(0, 9, 2, seed=1)
    assert mp3_meta(a + b) is None
    # same params concatenated IS a longer valid CBR stream
    meta = mp3_meta(a + a)
    assert meta is not None and meta[2] == 4


def test_padding_bit_changes_length():
    assert frame_length(128, 44100, 1) == frame_length(128, 44100, 0) + 1
    # seed parity flips which frames are padded; total length differs
    # only when n is odd
    for n in (3, 4):
        d0, d1 = (len(make_mp3(0, 9, n, seed=s)) for s in (0, 1))
        assert (d0 == d1) == (n % 2 == 0)


def test_id3_malformed_syncsafe_abstains():
    data = bytearray(make_mp3(1, 7, 2, 5, with_id3=True, id3_size=12))
    data[6] |= 0x80  # syncsafe bytes must have MSB clear
    assert mp3_meta(bytes(data)) is None


def test_empty_and_tag_only_abstain():
    assert mp3_meta(None) is None
    assert mp3_meta(b"") is None
    only_tag = make_mp3(0, 5, 1, 0, with_id3=True, id3_size=8)[:18]
    assert mp3_meta(only_tag) is None
