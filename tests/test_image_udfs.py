"""Property tests for the image UDF surface (SURVEY.md §5.2 item 3):
max-dim cap, aspect preservation, unreadable→null-not-exception,
size bookkeeping — through the real pandas-UDF/Arrow path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from developing_img_etl_spark.multimodal import image as IMG


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, IMG.make_fake_image(648, 490)),     # under cap → resize no-op
        (2, IMG.make_fake_image(2048, 1536)),   # over cap → downscale
        (3, IMG.make_fake_image(1024, 1024)),   # exactly at cap → no-op
        (4, IMG.make_fake_image(4000, 100)),    # extreme aspect
        (5, b"\xff\xd8corrupt-not-an-image"),   # unreadable
        (6, None),                              # null input
    ]
    return spark.createDataFrame(rows, "id long, content binary")


def test_dims_and_guard(corpus):
    stats = IMG.with_image_stats(corpus).orderBy("id").collect()
    assert (stats[0].width, stats[0].height) == (648, 490)
    assert (stats[1].width, stats[1].height) == (2048, 1536)
    assert stats[4].width is None and not stats[4].readable
    assert stats[5].width is None and not stats[5].readable


def test_compress_properties(corpus):
    out = IMG.compress_pipeline(corpus)
    stats = IMG.with_image_stats(out, "content_out").orderBy("id").collect()
    by_id = {r.id: r for r in stats}
    # cap respected
    for i in (1, 2, 3, 4):
        assert max(by_id[i].width, by_id[i].height) <= IMG.MAX_DIM
    # no-op for already-small images
    assert (by_id[1].width, by_id[1].height) == (648, 490)
    # aspect preserved within truncation (±1px per SURVEY §5.2)
    assert by_id[2].width == 1024 and abs(by_id[2].height - 768) <= 1
    assert by_id[4].width == 1024 and by_id[4].height == 25
    # unreadable/null → status column, not exception (v2 semantics)
    assert by_id[5].status == "unreadable" and by_id[5].content_out is None
    assert by_id[6].status == "unreadable"
    # recompression shrinks payload (quality 65)
    assert by_id[1].size_gambar_kb < 648 * 490 / 1024


def test_size_kb_matches_length(corpus):
    stats = IMG.with_image_stats(corpus).filter(F.col("content").isNotNull())
    bad = stats.filter(
        F.abs(F.col("size_gambar_kb") - F.round(F.length("content") / 1024.0, 2)) > 1e-9
    )
    assert bad.count() == 0


# --------------------------------------------------------------------------
# audio/video plumbing (multimodal/av.py)
# --------------------------------------------------------------------------
def test_audio_metadata_and_guard(spark):
    from developing_img_etl_spark.multimodal.av import audio_metadata, make_fake_audio

    rows = [
        (1, make_fake_audio(16000, 32000)),
        (2, None),
        (3, b"not audio"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r.id: r for r in df.select("id", audio_metadata("content").alias("m")).select("id", "m.*").collect()}
    assert (out[1].sample_rate, out[1].n_samples, out[1].duration_s) == (16000, 32000, 2.0)
    assert out[2].sample_rate is None and out[3].sample_rate is None


def test_audio_frame_energy_shape(spark):
    from developing_img_etl_spark.multimodal.av import audio_frame_energy, make_fake_audio

    df = spark.createDataFrame(
        [(1, make_fake_audio(8000, 3000, seed=b"q"))], "id long, content binary"
    )
    e = df.select(audio_frame_energy("content").alias("e")).collect()[0].e
    # 3000-byte payload -> 3 frames of 1024/1024/952; constant seed byte
    assert len(e) == 3
    assert all(v == float(ord("q")) for v in e)


def test_video_frame_sampling_composes_with_image_udfs(spark):
    from developing_img_etl_spark.multimodal.av import make_fake_video, sample_frames
    from developing_img_etl_spark.multimodal.image import image_dims

    rows = [(1, make_fake_video(64, 48, 24, 5)), (2, b"junk"), (3, None)]
    vids = spark.createDataFrame(rows, "video_id long, content binary")
    frames = sample_frames(vids, every_n=2)
    got = frames.select("video_id", "frame_idx", image_dims("frame").alias("d")).collect()
    # video 1: frames 0,2,4; corrupt/null videos contribute zero rows
    assert sorted((r.video_id, r.frame_idx) for r in got) == [(1, 0), (1, 2), (1, 4)]
    assert all((r.d.width, r.d.height) == (64, 48) for r in got)
