"""Audio/video multimodal operators (training-data mandate: treat
audio/video as opaque binary columns with typed metadata; decode /
feature-extract / frame-sample as pandas UDFs).

Codec strategy mirrors image.py: no audio/video *library* ships in
this container, so the deterministic fake formats —
`FAKEAUD:{rate}:{n_samples}:` and `FAKEVID:{w}:{h}:{fps}:{n_frames}:`
headers — carry the plumbing contract (BinaryType columns, Arrow batch
shape, null-on-unreadable guard semantics, the mapInPandas
row-explosion for frame sampling, typed metadata structs). BOTH paths
additionally have REAL container formats routed ahead of the fake
seam exactly as BMP/PNG are routed ahead of FAKEIMG in image.py:
RIFF/WAV 16-bit PCM for audio (wav.py) and, for video, BOTH dominant
container families — RIFF MJPEG-in-AVI (avi.py, r8) and box-tree
MJPEG-in-MOV/QuickTime (mov.py, r9; MP4 is the ISO-BMFF descendant of
the same box walk). Remaining real formats (mp3/flac, fragmented mp4,
mkv/EBML) hit the decoder seam (soundfile / PyAV would slot in at
_decode_*) and until one is importable return null (the M3 guard),
never a wrong answer.

Frame sampling emits frames as FAKEIMG bytes on the fake path and as
the raw per-frame JPEG payloads on the AVI path, so the image UDF
surface (image_dims, compress_image, jpeg decode) composes directly
with sampled frames — the video path IS the image path after
sampling.

Scale: all metadata/feature extraction is map-side (no shuffle touches
the binary payload); frame sampling multiplies rows map-side before
any shuffle, and downstream grouping keys are (id, frame_idx) longs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .image import make_fake_image

_AUD_MAGIC = b"FAKEAUD:"
_VID_MAGIC = b"FAKEVID:"
# top-level QuickTime/ISO-BMFF box types that can legally open a file
_MOV_HEADS = (b"ftyp", b"moov", b"mdat", b"wide", b"skip", b"free")
# the EBML header magic every Matroska/WebM file opens with
_MKV_MAGIC = b"\x1a\x45\xdf\xa3"


def make_fake_audio(sample_rate: int, n_samples: int, seed: bytes = b"a") -> bytes:
    payload = (seed * (n_samples // max(len(seed), 1) + 1))[:n_samples]
    return b"FAKEAUD:%d:%d:" % (sample_rate, n_samples) + payload


def make_fake_video(width: int, height: int, fps: int, n_frames: int) -> bytes:
    return b"FAKEVID:%d:%d:%d:%d:" % (width, height, fps, n_frames)


def _decode_audio_meta(data: bytes | None) -> tuple[int, int] | None:
    """(sample_rate, n_samples) or None if unreadable (M3 guard)."""
    if data is None:
        return None
    data = bytes(data)
    if data[:4] == b"RIFF":  # real container format: RIFF/WAV PCM (wav.py)
        from .wav import wav_meta

        return wav_meta(data)
    if not data.startswith(_AUD_MAGIC):
        return None  # seam for further real decoders: soundfile.info would go here
    try:
        parts = data.split(b":", 3)
        return int(parts[1]), int(parts[2])
    except Exception:  # noqa: BLE001
        return None


def _decode_video_meta(data: bytes | None) -> tuple[int, int, int, int] | None:
    """(width, height, fps, n_frames) or None if unreadable."""
    if data is None:
        return None
    data = bytes(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        # real container format: MJPEG-in-AVI (avi.py), routed ahead of
        # the fake seam exactly as WAV is for FAKEAUD above
        from .avi import avi_meta

        return avi_meta(data)
    if len(data) >= 8 and data[4:8] in _MOV_HEADS:
        # real container formats #2/#3, same box-tree family: monolithic
        # MJPEG-in-MOV/QuickTime (mov.py, r9), else fragmented MP4
        # (fmp4.py, r10 — moof/tfhd/trun sample addressing). mov_meta
        # returns None on a sample-table-less moov, so the fragmented
        # walker only runs where the monolithic one abstains.
        from .fmp4 import fmp4_meta
        from .mov import mov_meta

        m = mov_meta(data)
        return m if m is not None else fmp4_meta(data)
    if data[:4] == _MKV_MAGIC:
        # real container family #4: EBML/Matroska V_MJPEG (mkv.py, r10)
        from .mkv import mkv_meta

        return mkv_meta(data)
    if not data.startswith(_VID_MAGIC):
        return None  # seam for remaining real decoders (mp3/flac): av.open here
    try:
        parts = data.split(b":", 5)
        return int(parts[1]), int(parts[2]), int(parts[3]), int(parts[4])
    except Exception:  # noqa: BLE001
        return None


@pandas_udf(
    T.StructType(
        [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_s", T.DoubleType()),
        ]
    )
)
def audio_metadata(content: pd.Series) -> pd.DataFrame:
    """Typed audio metadata; nulls for unreadable inputs."""
    meta = content.map(_decode_audio_meta)
    return pd.DataFrame(
        {
            "sample_rate": meta.map(lambda m: m[0] if m else None),
            "n_samples": meta.map(lambda m: m[1] if m else None),
            "duration_s": meta.map(lambda m: round(m[1] / m[0], 6) if m else None),
        }
    )


@pandas_udf(T.ArrayType(T.DoubleType()))
def audio_frame_energy(content: pd.Series) -> pd.Series:
    """Per-frame mean byte energy (1024-sample frames) — the
    feature-extract step as a vectorized UDF. Deterministic on the fake
    format; a real decoder would PCM-decode then window identically."""

    def energy(data):
        meta = _decode_audio_meta(data)
        if meta is None:
            return None
        payload = bytes(data).split(b":", 3)[3]
        frames = [payload[i : i + 1024] for i in range(0, len(payload), 1024)]
        return [round(sum(f) / max(len(f), 1), 6) for f in frames]

    return content.map(energy)


@pandas_udf(
    T.StructType(
        [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("fps", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
)
def video_metadata(content: pd.Series) -> pd.DataFrame:
    meta = content.map(_decode_video_meta)
    return pd.DataFrame(
        {
            "width": meta.map(lambda m: m[0] if m else None),
            "height": meta.map(lambda m: m[1] if m else None),
            "fps": meta.map(lambda m: m[2] if m else None),
            "n_frames": meta.map(lambda m: m[3] if m else None),
        }
    )


def sample_frames(
    videos: DataFrame,
    *,
    id_col: str = "video_id",
    content_col: str = "content",
    every_n: int = 2,
) -> DataFrame:
    """Frame sampling as mapInPandas row explosion: one input video row
    → one output row per sampled frame, map-side (no shuffle touches
    frame bytes). Output frames are FAKEIMG binaries, so image UDFs
    compose downstream. Unreadable videos yield zero rows (M3 guard)."""
    out_schema = T.StructType(
        [
            T.StructField("video_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import avi_frames
        from .fmp4 import fmp4_frames
        from .mkv import mkv_frames
        from .mov import mov_frames

        for pdf in batches:
            rows = []
            for vid, data in zip(pdf[id_col], pdf[content_col]):
                meta = _decode_video_meta(data)
                if meta is None:
                    continue
                w, h, _fps, n = meta
                raw = bytes(data)
                if (
                    raw[:4] == b"RIFF"
                    or raw[4:8] in _MOV_HEADS
                    or raw[:4] == _MKV_MAGIC
                ):
                    # real MJPEG container (AVI '00dc' chunks / MOV
                    # stsz+stco samples / MKV SimpleBlocks): each
                    # payload is a complete JPEG, so the sampled frame
                    # IS the payload — no re-encode, and skipped frames
                    # are never decoded
                    if raw[:4] == b"RIFF":
                        payloads = avi_frames(raw)
                    elif raw[:4] == _MKV_MAGIC:
                        payloads = mkv_frames(raw)
                    else:
                        payloads = mov_frames(raw)
                        if payloads is None:
                            payloads = fmp4_frames(raw)
                    if payloads is None:
                        continue
                    for idx in range(0, min(n, len(payloads)), every_n):
                        rows.append((vid, idx, w, h, payloads[idx]))
                    continue
                for idx in range(0, n, every_n):
                    rows.append(
                        (vid, idx, w, h, make_fake_image(w, h, seed=b"%d:%d" % (vid, idx)))
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "width", "height", "frame"]
            )

    return videos.mapInPandas(explode_frames, out_schema)
