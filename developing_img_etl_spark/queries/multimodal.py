"""Multimodal + near-dup query entries (SURVEY.md §2.8 M1-M7).

Image queries synthesize deterministic FAKEIMG binary columns from the
`part` table JVM-side (no image fixtures in the testdata), push them
through the REAL pandas-UDF surface (multimodal/image.py), and — because
the fake codec's arithmetic is integer-exact — the DuckDB oracle can
mirror the whole decode→resize→encode pipeline in SQL. The plumbing
being verified (Arrow batches, BinaryType columns, null-guard, resize
truncation arithmetic) is exactly what the engine owns; only the pixel
codec itself is swapped at the seam.

MinHash/SimHash/LSH queries are approximate or Spark-hash-specific →
rows-only here, recall-checked against exact ground truth in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..multimodal.image import compress_pipeline, with_image_stats
from ..operators import dedup as DD
from ..operators import similarity as SIM


def _pin_for_sort(df: DataFrame) -> DataFrame:
    """Lazy-pin the (small) final frame before the global orderBy.

    The range partitioner behind orderBy SAMPLES its child to pick the
    sort boundaries, and in these codec chains there is no exchange
    between the Python UDFs and the sort — so that sampling job re-ran
    the ENTIRE decode/resize/encode chain a second time per action
    (r12 find: m18 ran as two 32-task UDF stages; a paired A/B with
    the pin measured 5.02 -> 2.75 s min, one UDF stage). The pinned
    frame holds only ids/stats/flags — kilobytes at any scale — and
    the sampler reads the cached rows instead of re-decoding."""
    return df.localCheckpoint(eager=False)


# --------------------------------------------------------------------------
# Synthetic image corpus: deterministic dims from part attributes; every
# 97th part is corrupt (M3 guard); parts with p_size > 48 exceed the
# 1024 cap (M1 resize path). Payload bounded to 4 KB.
# --------------------------------------------------------------------------


def _fake_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12: widen like every other codec corpus — without it the whole
    # FAKEIMG decode/resize/encode UDF chain ran as ONE task on a
    # single-split local part scan (m1 noop profiled at 2.46 s on 1 of
    # 32 cores).
    part = _widen(load(spark, sf_dir, "part"))
    w = F.when(F.col("p_size") > 48, 1200 + F.col("p_size")).otherwise(32 + F.col("p_size"))
    h = (w * 3 / 4).cast("int")
    payload_len = F.least(w * h, F.lit(4096))
    content = F.concat(
        F.lit("FAKEIMG:"),
        w.cast("string"),
        F.lit(":"),
        h.cast("string"),
        F.lit(":"),
        F.repeat(F.lit("x"), payload_len),
    ).cast("binary")
    corrupt = F.col("p_partkey") % 97 == 0
    return part.select(
        "p_partkey",
        F.when(corrupt, F.lit("GARBAGE").cast("binary")).otherwise(content).alias("content"),
    )


_FAKE_SQL_BASE = """
  SELECT p_partkey,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 1200 + p_size
              ELSE 32 + p_size END AS w,
         -- floor before CAST: DuckDB int-casts ROUND, Spark/Python truncate
         CAST(floor(CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN (1200 + p_size) * 3 / 4.0
              ELSE (32 + p_size) * 3 / 4.0 END) AS INT) AS h
  FROM part
"""


# --------------------------------------------------------------------------
# M2/M3 — metadata extraction + unreadable guard through the pandas UDF.
# --------------------------------------------------------------------------
def m2_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = _fake_images(spark, sf_dir)
    stats = with_image_stats(imgs)
    return _pin_for_sort(
        stats.select(
            "p_partkey",
            "width",
            "height",
            F.col("size_gambar_kb"),
            "readable",
        )
    ).orderBy("p_partkey")


M2_SQL = f"""
WITH dims AS ({_FAKE_SQL_BASE})
SELECT p_partkey,
       w AS width,
       h AS height,
       ROUND(CASE WHEN w IS NULL THEN length('GARBAGE')
                  ELSE length('FAKEIMG:' || w || ':' || h || ':') + least(w * h, 4096)
             END / 1024.0, 2) AS size_gambar_kb,
       w IS NOT NULL AS readable
FROM dims
ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# M1 — compress: resize-if-over-cap arithmetic + re-encode through the
# pandas UDF; per-record status (v2 skip-and-continue).
# --------------------------------------------------------------------------
def m1_image_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = _fake_images(spark, sf_dir)
    out = compress_pipeline(imgs)
    return _pin_for_sort(
        out.select(
            "p_partkey",
            "status",
            F.length("content_out").cast("long").alias("out_bytes"),
        )
    ).orderBy("p_partkey")


# int(dim*scale) truncation and int(w*h*0.65) body both mirror exactly:
# positive values → CAST AS INT == Python int() truncation.
M1_SQL = f"""
WITH dims AS ({_FAKE_SQL_BASE}),
resized AS (
  SELECT p_partkey, w, h,
         CASE WHEN greatest(w, h) > 1024
              THEN CAST(floor(w * (1024.0 / greatest(w, h))) AS INT) ELSE w END AS w2,
         CASE WHEN greatest(w, h) > 1024
              THEN CAST(floor(h * (1024.0 / greatest(w, h))) AS INT) ELSE h END AS h2
  FROM dims
)
SELECT p_partkey,
       CASE WHEN w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       CASE WHEN w IS NULL THEN NULL
            ELSE CAST(length('FAKEIMG:' || w2 || ':' || h2 || ':')
                 + least(CAST(floor(w2 * h2 * 0.65) AS INT), least(w * h, 4096)) AS BIGINT)
       END AS out_bytes
FROM resized
ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# M7 — multimodal binding: binary + text + embedding columns in one
# frame, joined on key; aggregates per readability flag.
# --------------------------------------------------------------------------
def m7_multimodal_bind(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = with_image_stats(_fake_images(spark, sf_dir))
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    bound = (
        imgs.join(docs, imgs.p_partkey == docs.doc_id)
        .join(emb, docs.doc_id == emb.vec_id)
        .select("doc_id", "readable", "lang", F.size("embedding").alias("dim"), "n_chars")
    )
    return (
        bound.groupBy("readable", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("dim").alias("max_dim"),
        )
        .orderBy("readable", "lang")
    )


M7_SQL = f"""
WITH dims AS ({_FAKE_SQL_BASE})
SELECT d.w IS NOT NULL AS readable, doc.lang,
       COUNT(*) AS n,
       CAST(SUM(doc.n_chars) AS BIGINT) AS sum_chars,
       CAST(MAX(len(e.embedding)) AS INT) AS max_dim
FROM dims d
JOIN documents doc ON d.p_partkey = doc.doc_id
JOIN embeddings e ON doc.doc_id = e.vec_id
GROUP BY 1, 2
ORDER BY readable, lang
"""


# --------------------------------------------------------------------------
# M5/M4 extensions — approximate dedup/ANN paths (rows-only; recall
# tests in tests/test_approx_ops.py pin them to exact ground truth).
# --------------------------------------------------------------------------
def m4_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    doubled = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    )
    return DD.minhash_near_dups(doubled, threshold=0.5).orderBy("id_a", "id_b")


def m5_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    doubled = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    )
    return DD.simhash_dup_groups(doubled).orderBy("simhash", "doc_id")


def m6_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return SIM.rp_lsh_topk(emb, probes, k=5).orderBy("probe_id", F.desc("sim"), "vec_id")


def m9_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted-list) ANN tier — recall-checked vs brute
    force in tests, rows-only here (approximate by design)."""
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return SIM.ivf_topk(emb, probes, k=5).orderBy("probe_id", F.desc("sim"), "vec_id")


def m15_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC ANN tier (operators/pq.py) — 32×
    compressed code scan + exact rerank; recall-checked vs brute force
    in tests, rows-only here (approximate by design, like m6/m9)."""
    from ..operators import pq as PQ

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return PQ.pq_topk(emb, probes, k=5).orderBy("probe_id", F.desc("sim"), "vec_id")


def m8_numpy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas/numpy exact path — must equal q13 (same oracle).

    NOTE: building this query runs a bounded Spark job (collecting the
    10 probe rows to the driver) — the numpy tier broadcasts the probe
    MATRIX into the UDF closure by design, so probe collection is part
    of plan construction, not execution. Callers who need a fully lazy
    build should use q13 (Catalyst) or m6/m9 (LSH/IVF) instead."""
    emb = load(spark, sf_dir, "embeddings")
    probes_pd = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding").toPandas()
    out = SIM.numpy_topk(emb, probes_pd, k=5)
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "vec_id")
    return out.select(
        "probe_id", "vec_id", "sim", F.row_number().over(w).cast("long").alias("rk")
    ).orderBy("probe_id", "rk")


def m13_arrow_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m8 on mapInArrow (flat-buffer reshape, no pandas hop) — third
    exact tier, same Q13 oracle: Catalyst (q13), mapInPandas (m8), and
    mapInArrow (here) must agree bit-for-bit. Same bounded
    plan-construction NOTE as m8 (probe collection)."""
    emb = load(spark, sf_dir, "embeddings")
    probes_pd = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding").toPandas()
    out = SIM.arrow_topk(emb, probes_pd, k=5)
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "vec_id")
    return out.select(
        "probe_id", "vec_id", "sim", F.row_number().over(w).cast("long").alias("rk")
    ).orderBy("probe_id", "rk")


QUERIES = {
    "m1_image_compress": m1_image_compress,
    "m2_image_metadata": m2_image_metadata,
    "m7_multimodal_bind": m7_multimodal_bind,
    "m4_minhash_near_dups": m4_minhash_near_dups,
    "m5_simhash_groups": m5_simhash_groups,
    "m6_ann_lsh_topk": m6_ann_lsh_topk,
    "m8_numpy_topk": m8_numpy_topk,
    "m9_ann_ivf_topk": m9_ann_ivf_topk,
    "m13_arrow_topk": m13_arrow_topk,
    "m15_ann_pq_topk": m15_ann_pq_topk,
}

from .similarity import Q13_SQL  # noqa: E402  (m8/m13 are exact — same oracle)

ORACLES = {
    "m1_image_compress": M1_SQL,
    "m2_image_metadata": M2_SQL,
    "m7_multimodal_bind": M7_SQL,
    "m8_numpy_topk": Q13_SQL,
    "m13_arrow_topk": Q13_SQL,
    # m4/m5/m6: approximate or Spark-hash-specific → rows-only
}


# --------------------------------------------------------------------------
# M10/M11 — audio/video plumbing (multimodal/av.py) through the REAL
# pandas-UDF / mapInPandas surface, oracle-mirrored arithmetic: fake
# binaries are synthesized from `documents` attributes JVM-side, parsed
# back by the UDFs, so DuckDB can compute the same metadata directly.
# --------------------------------------------------------------------------
def _fake_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    rate = (8000 * (1 + F.col("doc_id") % 3)).cast("int")
    n_samples = (1000 + (F.col("doc_id") % 50) * 100).cast("long")
    content = F.concat(
        F.lit("FAKEAUD:"),
        rate.cast("string"),
        F.lit(":"),
        n_samples.cast("string"),
        F.lit(":"),
        F.repeat(F.lit("a"), F.least(n_samples, F.lit(4096)).cast("int")),
    ).cast("binary")
    corrupt = F.col("doc_id") % 89 == 0
    return docs.select(
        "doc_id",
        F.when(corrupt, F.lit("NOISE").cast("binary")).otherwise(content).alias("content"),
    )


def m10_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.av import audio_metadata

    audio = _fake_audio(spark, sf_dir)
    meta = audio.select("doc_id", audio_metadata(F.col("content")).alias("m"))
    return _pin_for_sort(
        meta.select(
            "doc_id",
            F.col("m.sample_rate").alias("sample_rate"),
            F.col("m.n_samples").alias("n_samples"),
            F.col("m.duration_s").alias("duration_s"),
        ).filter(F.col("sample_rate").isNotNull())  # M3 guard drops corrupt
    ).orderBy("doc_id")


M10_SQL = """
SELECT doc_id,
       CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
       CAST(1000 + (doc_id % 50) * 100 AS BIGINT) AS n_samples,
       ROUND((1000 + (doc_id % 50) * 100) / (8000.0 * (1 + doc_id % 3)), 6) AS duration_s
FROM documents
WHERE doc_id % 89 <> 0
ORDER BY doc_id
"""


def _fake_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_frames = (3 + F.col("doc_id") % 5).cast("int")
    content = F.concat(
        F.lit("FAKEVID:64:48:24:"),
        n_frames.cast("string"),
        F.lit(":"),
    ).cast("binary")
    corrupt = F.col("doc_id") % 89 == 0
    return docs.select(
        F.col("doc_id").alias("video_id"),
        F.when(corrupt, F.lit("NOISE").cast("binary")).otherwise(content).alias("content"),
    )


def m11_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every 2nd frame) + image-UDF composition: the
    sampled FAKEIMG frame bytes flow through image_dims, proving the
    video path IS the image path after sampling."""
    from ..multimodal.av import sample_frames
    from ..multimodal.image import image_dims

    vids = _fake_videos(spark, sf_dir)
    frames = sample_frames(vids, id_col="video_id", every_n=2)
    dims = frames.select(
        "video_id", "frame_idx", image_dims(F.col("frame")).alias("d")
    )
    return _pin_for_sort(
        dims.select(
            "video_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.col("d.width").alias("frame_w"),
            F.col("d.height").alias("frame_h"),
        )
    ).orderBy("video_id", "frame_idx")


M11_SQL = """
SELECT doc_id AS video_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       64 AS frame_w,
       48 AS frame_h
FROM documents, UNNEST(range(0, 3 + doc_id % 5, 2)) AS t(frame_idx)
WHERE doc_id % 89 <> 0
ORDER BY video_id, frame_idx
"""


QUERIES["m10_audio_metadata"] = m10_audio_metadata
QUERIES["m11_video_frame_sample"] = m11_video_frame_sample
ORACLES["m10_audio_metadata"] = M10_SQL
ORACLES["m11_video_frame_sample"] = M11_SQL


# --------------------------------------------------------------------------
# M12 — the REAL raster path (multimodal/bmp.py): generate actual
# 24-bit BMP pixel data per part row, run decode → nearest-neighbor
# downscale → lossless re-encode through the same compress_pipeline
# surface, and let the oracle predict output dims AND byte size exactly
# (BMP size is pure arithmetic: 54 + 4-byte-padded row stride × h).
# Unlike m1 this is not a header-format seam — pixels really move.
# Over-cap rows are kept short (h=8) so the corpus stays KB-sized.
# --------------------------------------------------------------------------
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.BinaryType())
def _gen_bmp(w: pd.Series, h: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.bmp import make_bmp

    return pd.Series(
        [
            None if pd.isna(a) else make_bmp(int(a), int(b), int(s))
            for a, b, s in zip(w, h, seed)
        ],
        dtype=object,
    )


def _widen(df: DataFrame) -> DataFrame:
    """Small local scans are 1-2 splits; the pandas-UDF pixel work would
    run on 1 of 32 cores without this. No-op at real scan sizes."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _bmp_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every 10th part: the pixel corpus exercises the codec fully at a
    # tenth of the per-row Python cost (and keeps m14's per-pixel
    # oracle bounded — same sampling there)
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0))
    corrupt = F.col("p_partkey") % 97 == 0
    w = F.when(F.col("p_size") > 48, 1200 + F.col("p_size")).otherwise(
        16 + F.pmod(F.col("p_size"), F.lit(64))
    )
    h = F.when(F.col("p_size") > 48, F.lit(8)).otherwise(F.lit(12))
    return part.select(
        "p_partkey",
        F.when(corrupt, F.lit(b"BMcorrupt"))
        .otherwise(_gen_bmp(w, h, F.pmod(F.col("p_partkey"), F.lit(251))))
        .alias("content"),
    )


def m12_bmp_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = _bmp_corpus(spark, sf_dir)
    out = compress_pipeline(imgs)
    stats = with_image_stats(out, "content_out")
    return _pin_for_sort(
        stats.select(
            "p_partkey",
            "status",
            "width",
            "height",
            F.length("content_out").cast("long").alias("out_bytes"),
        )
    ).orderBy("p_partkey")


M12_SQL = """
WITH dims AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 1200 + p_size
              ELSE 16 + (p_size % 64) END AS w,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 8 ELSE 12 END AS h
  FROM part
  WHERE p_partkey % 10 = 0
),
resized AS (
  SELECT p_partkey, w, h,
         CASE WHEN greatest(w, h) > 1024
              THEN greatest(CAST(floor(w * (1024.0 / greatest(w, h))) AS INT), 1)
              ELSE w END AS w2,
         CASE WHEN greatest(w, h) > 1024
              THEN greatest(CAST(floor(h * (1024.0 / greatest(w, h))) AS INT), 1)
              ELSE h END AS h2
  FROM dims
)
SELECT p_partkey,
       CASE WHEN w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       w2 AS width,
       h2 AS height,
       -- exact BMP size: 14+40 header + stride(w)*h, stride padded to 4
       CASE WHEN w IS NULL THEN NULL
            ELSE CAST(54 + (CAST(floor((w2 * 3 + 3) / 4.0) AS INT) * 4) * h2 AS BIGINT)
       END AS out_bytes
FROM resized
ORDER BY p_partkey
"""

QUERIES["m12_bmp_compress"] = m12_bmp_compress
ORACLES["m12_bmp_compress"] = M12_SQL


# --------------------------------------------------------------------------
# M14 — PNG compress: the stdlib *compressed*-format pixel path
# (multimodal/png.py). Same decode→resize→re-encode pipeline as m12,
# but through inflate/unfilter and refilter/deflate. DEFLATE output
# size is not arithmetic, so instead of byte counts the query emits a
# position-weighted checksum of the DECODED OUTPUT pixels — the oracle
# recomputes it in pure SQL from the gradient + nearest-neighbor index
# arithmetic (min(floor(dst * src/dst), src-1), the reference's
# truncation style). Any corrupted/moved/dropped byte anywhere in
# generate → deflate → inflate → resize → deflate → inflate mismatches.
# Corpus is every 10th part so the oracle's per-pixel UNNEST stays
# bounded (~1.5 M rows at sf0.1).
# --------------------------------------------------------------------------
@pandas_udf(T.BinaryType())
def _gen_png(w: pd.Series, h: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.png import make_png

    return pd.Series(
        [
            None if pd.isna(a) else make_png(int(a), int(b), int(s))
            for a, b, s in zip(w, h, seed)
        ],
        dtype=object,
    )


@pandas_udf(T.LongType())
def _png_pixel_checksum(content: pd.Series) -> pd.Series:
    from ..multimodal.png import pixel_checksum, png_decode

    def chk(b):
        if b is None:
            return None
        arr = png_decode(bytes(b))
        return None if arr is None else pixel_checksum(arr)

    return content.map(chk)


def _png_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0))
    corrupt = F.col("p_partkey") % 97 == 0
    w = F.when(F.col("p_size") > 48, 1200 + F.col("p_size")).otherwise(
        16 + F.pmod(F.col("p_size"), F.lit(48))
    )
    h = F.when(F.col("p_size") > 48, F.lit(8)).otherwise(12 + F.pmod(F.col("p_size"), F.lit(16)))
    return part.select(
        "p_partkey",
        F.when(corrupt, F.lit(b"\x89PNG-corrupt"))
        .otherwise(_gen_png(w, h, F.pmod(F.col("p_partkey"), F.lit(251))))
        .alias("content"),
    )


def m14_png_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = _png_corpus(spark, sf_dir)
    out = compress_pipeline(imgs)
    stats = with_image_stats(out, "content_out")
    return _pin_for_sort(
        stats.select(
            "p_partkey",
            "status",
            "width",
            "height",
            _png_pixel_checksum(F.col("content_out")).alias("pixel_checksum"),
        )
    ).orderBy("p_partkey")


M14_SQL = """
WITH dims AS (
  SELECT p_partkey,
         p_partkey % 251 AS seed,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 1200 + p_size
              ELSE 16 + (p_size % 48) END AS w,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 8
              ELSE 12 + (p_size % 16) END AS h
  FROM part
  WHERE p_partkey % 10 = 0
),
resized AS (
  SELECT p_partkey, seed, w, h,
         CASE WHEN greatest(w, h) > 1024
              THEN greatest(CAST(floor(w * (1024.0 / greatest(w, h))) AS INT), 1)
              ELSE w END AS w2,
         CASE WHEN greatest(w, h) > 1024
              THEN greatest(CAST(floor(h * (1024.0 / greatest(w, h))) AS INT), 1)
              ELSE h END AS h2
  FROM dims
),
px AS (
  SELECT p_partkey,
         SUM(
           -- source indices: the nn_resize gather, min(floor(dst*src/dst), src-1)
           ((seed * 29 + least(CAST(floor(x2 * (w * 1.0 / w2)) AS BIGINT), w - 1)
                       + least(CAST(floor(y2 * (h * 1.0 / h2)) AS BIGINT), h - 1)) % 256)
             * ((y2 * w2 + x2) * 3 + 1)
           + ((seed * 11 + least(CAST(floor(x2 * (w * 1.0 / w2)) AS BIGINT), w - 1) * 3
                         + least(CAST(floor(y2 * (h * 1.0 / h2)) AS BIGINT), h - 1) * 5) % 256)
             * ((y2 * w2 + x2) * 3 + 2)
           + ((seed + least(CAST(floor(x2 * (w * 1.0 / w2)) AS BIGINT), w - 1) * 7
                    + least(CAST(floor(y2 * (h * 1.0 / h2)) AS BIGINT), h - 1) * 13) % 256)
             * ((y2 * w2 + x2) * 3 + 3)
         ) AS pixel_checksum
  FROM resized,
       UNNEST(range(0, resized.h2)) AS ty(y2),
       UNNEST(range(0, resized.w2)) AS tx(x2)
  WHERE w IS NOT NULL
  GROUP BY p_partkey
)
SELECT r.p_partkey,
       CASE WHEN r.w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       r.w2 AS width,
       r.h2 AS height,
       px.pixel_checksum
FROM resized r LEFT JOIN px ON r.p_partkey = px.p_partkey
ORDER BY r.p_partkey
"""

QUERIES["m14_png_compress"] = m14_png_compress
ORACLES["m14_png_compress"] = M14_SQL


# --------------------------------------------------------------------------
# M16 — the REAL audio path (multimodal/wav.py): generate actual
# RIFF/WAV 16-bit PCM per document row, run decode → nearest-neighbor
# resample to a quarter rate → lossless re-encode → decode again, and
# emit integer-exact features of the final signal. Every sample is a
# pure function of (seed, i) and the resample gather is pure integer
# division ((j*n)//dst_n), so the oracle replays generate → resample →
# feature arithmetic entirely in SQL — any corrupted/moved/dropped byte
# through encode→decode→resample→encode→decode mismatches. Corpus is
# every 5th document so the oracle's per-sample UNNEST stays bounded
# (~250 k rows at sf0.1). Corrupt rows carry a RIFF magic with a
# truncated body — the guard exercised INSIDE the real chunk walker,
# not at a magic-byte shortcut.
# --------------------------------------------------------------------------
import numpy as np


@pandas_udf(T.BinaryType())
def _gen_wav(rate: pd.Series, n: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.wav import make_wav

    return pd.Series(
        [make_wav(int(r), int(a), int(s)) for r, a, s in zip(rate, n, seed)],
        dtype=object,
    )


@pandas_udf(T.BinaryType())
def _wav_resample_quarter(content: pd.Series) -> pd.Series:
    from ..multimodal.wav import resample_nearest, wav_decode, wav_encode

    def go(b):
        if b is None:
            return None
        decoded = wav_decode(bytes(b))
        if decoded is None:
            return None
        rate, channels, samples = decoded
        if channels != 1:
            return None
        return wav_encode(rate, resample_nearest(samples, max(len(samples) // 4, 1)))

    return content.map(go)


@pandas_udf(
    T.StructType(
        [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_out", T.LongType()),
            T.StructField("sum_abs", T.LongType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("checksum", T.LongType()),
        ]
    )
)
def _wav_features(content: pd.Series) -> pd.DataFrame:
    from ..multimodal.wav import wav_decode

    rows = []
    for b in content:
        decoded = wav_decode(bytes(b)) if b is not None else None
        if decoded is None or len(decoded[2]) == 0:
            rows.append((None, None, None, None, None))
            continue
        rate, _channels, samples = decoded
        v = samples.astype(np.int64)
        pos = np.arange(1, len(v) + 1, dtype=np.int64)
        rows.append(
            (
                rate,
                len(v),
                int(np.abs(v).sum()),
                int(np.abs(v).max()),
                int(((v + 1024) * pos).sum()),
            )
        )
    return pd.DataFrame(
        rows, columns=["sample_rate", "n_out", "sum_abs", "peak", "checksum"]
    )


def m16_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _widen(load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0))
    corrupt = F.col("doc_id") % 89 == 0
    rate = (8000 * (1 + F.col("doc_id") % 3)).cast("int")
    n = (500 + (F.col("doc_id") % 40) * 25).cast("int")
    seed = F.pmod(F.col("doc_id"), F.lit(251)).cast("int")
    wavs = docs.select(
        "doc_id",
        F.when(corrupt, F.lit(b"RIFFjunk")).otherwise(_gen_wav(rate, n, seed)).alias("content"),
    )
    out = wavs.select("doc_id", _wav_resample_quarter(F.col("content")).alias("content_out"))
    feats = out.select(
        "doc_id",
        F.length("content_out").cast("long").alias("out_bytes"),
        _wav_features(F.col("content_out")).alias("f"),
    )
    return _pin_for_sort(
        feats.select(
            "doc_id",
            F.when(F.col("f.sample_rate").isNull(), F.lit("unreadable"))
            .otherwise(F.lit("ok"))
            .alias("status"),
            F.col("f.sample_rate").alias("sample_rate"),
            F.col("f.n_out").alias("n_out"),
            "out_bytes",
            F.col("f.sum_abs").alias("sum_abs"),
            F.col("f.peak").alias("peak"),
            F.col("f.checksum").alias("checksum"),
        )
    ).orderBy("doc_id")


M16_SQL = """
WITH base AS (
  SELECT doc_id,
         doc_id % 251 AS seed,
         CAST(8000 * (1 + doc_id % 3) AS INT) AS rate,
         500 + (doc_id % 40) * 25 AS n
  FROM documents
  WHERE doc_id % 5 = 0
),
ok AS (
  SELECT *, n // 4 AS dst_n FROM base WHERE doc_id % 89 <> 0
),
px AS (
  SELECT doc_id,
         CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
         CAST(MAX(ABS(v)) AS INT) AS peak,
         CAST(SUM((v + 1024) * (j + 1)) AS BIGINT) AS checksum
  FROM (
    SELECT doc_id, j,
           -- sample value at the integer-gather source index (j*n)//dst_n
           ((seed * 31 + ((j * n) // dst_n) * 17) % 2048) - 1024 AS v
    FROM ok, UNNEST(range(0, ok.dst_n)) AS t(j)
  )
  GROUP BY doc_id
)
SELECT b.doc_id AS doc_id,
       CASE WHEN b.doc_id % 89 = 0 THEN 'unreadable' ELSE 'ok' END AS status,
       CASE WHEN b.doc_id % 89 = 0 THEN NULL ELSE b.rate END AS sample_rate,
       CAST(CASE WHEN b.doc_id % 89 = 0 THEN NULL ELSE b.n // 4 END AS BIGINT) AS n_out,
       CAST(CASE WHEN b.doc_id % 89 = 0 THEN NULL
                 ELSE 44 + 2 * (b.n // 4) END AS BIGINT) AS out_bytes,
       px.sum_abs, px.peak, px.checksum
FROM base b LEFT JOIN px ON b.doc_id = px.doc_id
ORDER BY b.doc_id
"""

QUERIES["m16_wav_resample"] = m16_wav_resample
ORACLES["m16_wav_resample"] = M16_SQL


# --------------------------------------------------------------------------
# M17 — the GIF/LZW path (multimodal/gif.py): generate real
# palette-indexed GIF89a pixel data per part row, run decode →
# nearest-neighbor downscale → LZW re-encode through the same
# compress_pipeline surface, verify a position-weighted checksum of the
# DECODED OUTPUT pixels (LZW output size, like DEFLATE's, is not
# arithmetic). Third compression family through the pixel pipeline:
# none (BMP, m12), DEFLATE (PNG, m14), dictionary coding (here).
# Pixel slot c = (x*7 + y*13 + seed) % 64 with RGB = ((c*3+11)%256,
# (c*5+1)%256, (c*7+3)%256) — replayed by the oracle through the same
# nn-gather index arithmetic as m14. Corrupt rows carry a valid GIF
# header whose body ends before any image descriptor — the guard
# exercised INSIDE the block walker.
# --------------------------------------------------------------------------
@pandas_udf(T.BinaryType())
def _gen_gif(w: pd.Series, h: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.gif import make_gif

    return pd.Series(
        [
            None if pd.isna(a) else make_gif(int(a), int(b), int(s))
            for a, b, s in zip(w, h, seed)
        ],
        dtype=object,
    )


@pandas_udf(T.LongType())
def _gif_pixel_checksum(content: pd.Series) -> pd.Series:
    from ..multimodal.gif import gif_decode
    from ..multimodal.png import pixel_checksum

    def chk(b):
        if b is None:
            return None
        arr = gif_decode(bytes(b))
        return None if arr is None else pixel_checksum(arr)

    return content.map(chk)


def _gif_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0))
    corrupt = F.col("p_partkey") % 97 == 0
    w = F.when(F.col("p_size") > 48, 1200 + F.col("p_size")).otherwise(
        16 + F.pmod(F.col("p_size"), F.lit(40))
    )
    h = F.when(F.col("p_size") > 48, F.lit(8)).otherwise(12 + F.pmod(F.col("p_size"), F.lit(20)))
    return part.select(
        "p_partkey",
        F.when(corrupt, F.lit(b"GIF89acorrupt"))
        .otherwise(_gen_gif(w, h, F.pmod(F.col("p_partkey"), F.lit(251))))
        .alias("content"),
    )


def m17_gif_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = _gif_corpus(spark, sf_dir)
    out = compress_pipeline(imgs)
    stats = with_image_stats(out, "content_out")
    return _pin_for_sort(
        stats.select(
            "p_partkey",
            "status",
            "width",
            "height",
            _gif_pixel_checksum(F.col("content_out")).alias("pixel_checksum"),
        )
    ).orderBy("p_partkey")


M17_SQL = """
WITH dims AS (
  SELECT p_partkey,
         p_partkey % 251 AS seed,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 1200 + p_size
              ELSE 16 + (p_size % 40) END AS w,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 8
              ELSE 12 + (p_size % 20) END AS h
  FROM part
  WHERE p_partkey % 10 = 0
),
resized AS (
  SELECT p_partkey, seed, w, h,
         CASE WHEN greatest(w, h) > 1024
              THEN greatest(CAST(floor(w * (1024.0 / greatest(w, h))) AS INT), 1)
              ELSE w END AS w2,
         CASE WHEN greatest(w, h) > 1024
              THEN greatest(CAST(floor(h * (1024.0 / greatest(w, h))) AS INT), 1)
              ELSE h END AS h2
  FROM dims
),
px AS (
  SELECT p_partkey,
         SUM(((c * 3 + 11) % 256) * ((y2 * w2 + x2) * 3 + 1)
           + ((c * 5 + 1) % 256) * ((y2 * w2 + x2) * 3 + 2)
           + ((c * 7 + 3) % 256) * ((y2 * w2 + x2) * 3 + 3)) AS pixel_checksum
  FROM (
    SELECT p_partkey, w2, x2, y2,
           -- palette slot at the nn-gathered source pixel
           (least(CAST(floor(x2 * (w * 1.0 / w2)) AS BIGINT), w - 1) * 7
            + least(CAST(floor(y2 * (h * 1.0 / h2)) AS BIGINT), h - 1) * 13
            + seed) % 64 AS c
    FROM resized,
         UNNEST(range(0, resized.h2)) AS ty(y2),
         UNNEST(range(0, resized.w2)) AS tx(x2)
    WHERE w IS NOT NULL
  )
  GROUP BY p_partkey
)
SELECT r.p_partkey,
       CASE WHEN r.w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       r.w2 AS width,
       r.h2 AS height,
       px.pixel_checksum
FROM resized r LEFT JOIN px ON r.p_partkey = px.p_partkey
ORDER BY r.p_partkey
"""

QUERIES["m17_gif_compress"] = m17_gif_compress
ORACLES["m17_gif_compress"] = M17_SQL


# --------------------------------------------------------------------------
# M18 — JPEG compress: the reference's ACTUAL corpus format through a
# REAL baseline JFIF codec (multimodal/jpeg.py — Huffman entropy
# decode, quantized 8×8 DCT, YCbCr, quality 65 re-encode; the
# transform-coded fourth compression family after raster/DEFLATE/LZW).
# JPEG is lossy, so decoded pixels are NOT SQL arithmetic — instead
# the query certifies what IS exact: the resize-dimension contract
# (header-parsed from the emitted JFIF bytes) and a FIDELITY GATE —
# mean |decoded − expected| per image against the arithmetic gradient
# the corpus was generated from, thresholded far below the ~85 a
# mismatched image would score but above codec noise (measured worst
# 17.0 across the corpus shapes for generate@Q80 → decode → resize →
# re-encode@Q65 → decode; the sawtooth gradient is ringing-adversarial). A wrong DCT, quant table, Huffman code,
# color transform or resize gather all blow the gate. The decoded
# pixel arithmetic itself is pinned by pytest (uniform-block analytic
# round-trip, real 4:2:0 reference-photo decode, PIL-gated
# cross-check).
# --------------------------------------------------------------------------
_JPEG_GEN_QUALITY = 80
_JPEG_FIDELITY_BOUND = 32.0


@pandas_udf(T.BinaryType())
def _gen_jpeg(w: pd.Series, h: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.jpeg import jpeg_encode, make_photo

    return pd.Series(
        [
            None
            if pd.isna(a)
            else jpeg_encode(make_photo(int(a), int(b), int(s)), _JPEG_GEN_QUALITY)
            for a, b, s in zip(w, h, seed)
        ],
        dtype=object,
    )


@pandas_udf(T.BooleanType())
def _jpeg_fidelity_ok(
    content: pd.Series, w: pd.Series, h: pd.Series, seed: pd.Series
) -> pd.Series:
    import numpy as np

    from ..multimodal.bmp import nn_resize
    from ..multimodal.jpeg import jpeg_decode, make_photo

    def ok(args):
        b, ow, oh, s = args
        if b is None or pd.isna(ow):
            return None
        dec = jpeg_decode(bytes(b))
        if dec is None:
            return False
        expected = make_photo(int(ow), int(oh), int(s))
        eh, ew = dec.shape[0], dec.shape[1]
        if (ew, eh) != (int(ow), int(oh)):
            expected = nn_resize(expected, ew, eh)
        err = float(
            np.abs(dec.astype(np.int64) - expected.astype(np.int64)).mean()
        )
        return err <= _JPEG_FIDELITY_BOUND

    return pd.Series(
        [ok(a) for a in zip(content, w, h, seed)], dtype=object
    )


def _jpeg_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every 20th part (vs m14's 10th): the JPEG chain runs FIVE codec
    # passes per image — half the corpus keeps the declared query inside
    # the driver's per-query budget with identical coverage
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0))
    corrupt = F.col("p_partkey") % 97 == 0
    w = F.when(F.col("p_size") > 48, 1200 + F.col("p_size")).otherwise(
        16 + F.pmod(F.col("p_size"), F.lit(48))
    )
    h = F.when(F.col("p_size") > 48, F.lit(8)).otherwise(12 + F.pmod(F.col("p_size"), F.lit(16)))
    return part.select(
        "p_partkey",
        F.when(corrupt, F.lit(None).cast("int")).otherwise(w).alias("orig_w"),
        F.when(corrupt, F.lit(None).cast("int")).otherwise(h).alias("orig_h"),
        F.pmod(F.col("p_partkey"), F.lit(251)).alias("seed"),
        F.when(corrupt, F.lit(b"\xff\xd8-corrupt-jpeg-body"))
        .otherwise(_gen_jpeg(w, h, F.pmod(F.col("p_partkey"), F.lit(251))))
        .alias("content"),
    )


def m18_jpeg_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = _jpeg_corpus(spark, sf_dir)
    out = compress_pipeline(imgs)
    stats = with_image_stats(out, "content_out")
    return _pin_for_sort(
        stats.select(
            "p_partkey",
            "status",
            "width",
            "height",
            _jpeg_fidelity_ok(
                F.col("content_out"), F.col("orig_w"), F.col("orig_h"), F.col("seed")
            ).alias("fidelity_ok"),
        )
    ).orderBy("p_partkey")


M18_SQL = """
WITH dims AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 1200 + p_size
              ELSE 16 + (p_size % 48) END AS w,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              WHEN p_size > 48 THEN 8
              ELSE 12 + (p_size % 16) END AS h
  FROM part
  WHERE p_partkey % 20 = 0
),
resized AS (
  SELECT p_partkey, w, h,
         CASE WHEN greatest(w, h) > 1024
              THEN greatest(CAST(floor(w * (1024.0 / greatest(w, h))) AS INT), 1)
              ELSE w END AS w2,
         CASE WHEN greatest(w, h) > 1024
              THEN greatest(CAST(floor(h * (1024.0 / greatest(w, h))) AS INT), 1)
              ELSE h END AS h2
  FROM dims
)
SELECT p_partkey,
       CASE WHEN w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       w2 AS width,
       h2 AS height,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS fidelity_ok
FROM resized
ORDER BY p_partkey
"""

QUERIES["m18_jpeg_compress"] = m18_jpeg_compress
ORACLES["m18_jpeg_compress"] = M18_SQL


# --------------------------------------------------------------------------
# M19 — perceptual-hash image dedup (multimodal/phash.py): the IMAGE
# member of the near-dup family (MinHash/SimHash/Jaccard/cosine are
# all text/embedding-side). Corpus: structurally distinct textured
# images, one third of which also appear RE-ENCODED at a much lower
# JPEG quality — different bytes (exact dedup q14a would keep both),
# same picture. DCT pHash collapses them: luminance → 32×32 → 2-D
# DCT → 8×8 corner sign structure → 63-bit fingerprint; measured
# same-image re-encode distance ≤ 8 bits vs ≥ 18 for structurally
# different images. Pair generation follows the SimHash discipline:
# 8 bands × 8 bits, band-equality join (never all-pairs — band misses
# measured 0/120 for true pairs), exact Hamming ≤ 10 verification via
# codegen bit_count(xor). phash is computed MAP-SIDE before any
# shuffle, so image bytes never move (the M-family plan rule).
# Approximate by nature → rows-only; tests/test_image_udfs.py pins
# recall/precision against the constructed ground truth.
# --------------------------------------------------------------------------
_PHASH_HAMMING = 10
_PHASH_BANDS = 8


@pandas_udf(T.BinaryType())
def _gen_textured_jpeg(
    w: pd.Series, h: pd.Series, seed: pd.Series, quality: pd.Series
) -> pd.Series:
    from ..multimodal.jpeg import jpeg_encode
    from ..multimodal.phash import make_textured

    return pd.Series(
        [
            jpeg_encode(make_textured(int(a), int(b), int(s)), int(q))
            for a, b, s, q in zip(w, h, seed, quality)
        ],
        dtype=object,
    )


@pandas_udf(T.LongType())
def _phash_udf(content: pd.Series) -> pd.Series:
    from ..multimodal.jpeg import jpeg_decode
    from ..multimodal.phash import phash64

    def go(b):
        if b is None:
            return None
        arr = jpeg_decode(bytes(b))
        return None if arr is None else phash64(arr)

    return content.map(go)


def _phash_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0))
    w = 24 + F.pmod(F.col("p_size"), F.lit(40)) * 2
    h = 20 + F.pmod(F.col("p_size"), F.lit(24)) * 2
    seed = F.pmod(F.col("p_partkey"), F.lit(251))
    base = part.select(
        F.col("p_partkey").alias("img_id"),
        F.lit("o").alias("variant"),
        _gen_textured_jpeg(w, h, seed, F.lit(80)).alias("content"),
    )
    copies = (
        part.filter(F.col("p_partkey") % 3 == 0)
        .select(
            F.col("p_partkey").alias("img_id"),
            F.lit("c").alias("variant"),
            _gen_textured_jpeg(w, h, seed, F.lit(35)).alias("content"),
        )
    )
    return base.unionByName(copies)


def m19_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = _phash_corpus(spark, sf_dir)
    hashed = imgs.select(
        "img_id", "variant", _phash_udf(F.col("content")).alias("ph")
    ).localCheckpoint(eager=True)  # phash map-side once; bytes never shuffle
    banded = hashed.select(
        "img_id",
        "variant",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright("ph", i * 8).bitwiseAND(F.lit(255)).alias("bv"),
                    )
                    for i in range(_PHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("img_id", "variant", "ph", F.col("band.bi").alias("bi"), F.col("band.bv").alias("bv"))
    a = banded.select(
        F.col("img_id").alias("id_a"), F.col("variant").alias("var_a"),
        F.col("ph").alias("ph_a"), "bi", "bv",
    )
    b = banded.select(
        F.col("img_id").alias("id_b"), F.col("variant").alias("var_b"),
        F.col("ph").alias("ph_b"), "bi", "bv",
    )
    cand = (
        a.join(b, ["bi", "bv"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            | ((F.col("id_a") == F.col("id_b")) & (F.col("var_a") < F.col("var_b")))
        )
        .select("id_a", "var_a", "ph_a", "id_b", "var_b", "ph_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
        )
        .filter(F.col("hamming") <= _PHASH_HAMMING)
        .select("id_a", "var_a", "id_b", "var_b", "hamming")
        .orderBy("id_a", "var_a", "id_b", "var_b")
    )


QUERIES["m19_phash_dedup"] = m19_phash_dedup
# approximate (DCT thresholding) → rows-only; recall/precision pytest


# --------------------------------------------------------------------------
# M20 — REAL video frame sampling: MJPEG-in-AVI (multimodal/avi.py,
# the RIFF walk of wav.py composed with the baseline JPEG codec of
# jpeg.py) generated per part row, routed through the SAME
# sample_frames surface m11 drives over FAKEVID — the last fake
# decoder seam now has a real-bytes twin. JPEG is lossy, so decoded
# pixels are not SQL arithmetic; the m18 discipline applies: the
# oracle checks what IS exact — container metadata (w/h/fps/n_frames
# from the AVI headers), the sampled-index set (every_n = 2 → indices
# 0,2,4,..., count ceil(n/2), sum k(k-1)), the per-frame dimension
# contract (JPEG SOF of each emitted payload == container dims), and
# a per-frame FIDELITY GATE (mean |decoded − expected photo| <= the
# m18 bound; measured max 8.0 on this corpus, a mismatched frame
# scores ~85). Pixel arithmetic itself is pinned by avi/jpeg pytest.
# Corrupt rows carry a RIFF header whose AVI body is garbage — the
# guard exercised inside the chunk walker; they surface as
# 'unreadable' with zero sampled frames, never a wrong answer.
# Scale shape: generation, frame explosion, dim parse, and the
# fidelity decode are ALL map-side (frame bytes never shuffle); the
# only shuffles carry (video_id, small longs/bools).
# --------------------------------------------------------------------------
_AVI_FIDELITY_BOUND = 32.0


@pandas_udf(T.BinaryType())
def _gen_avi(w: pd.Series, h: pd.Series, fps: pd.Series, n: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.avi import make_avi

    return pd.Series(
        [
            None
            if pd.isna(a)
            else make_avi(int(a), int(b), int(f), int(k), int(s))
            for a, b, f, k, s in zip(w, h, fps, n, seed)
        ],
        dtype=object,
    )


@pandas_udf(
    T.StructType(
        [
            T.StructField("dims_ok", T.BooleanType()),
            T.StructField("fidelity_ok", T.BooleanType()),
        ]
    )
)
def _avi_frame_checks(
    frame: pd.Series, w: pd.Series, h: pd.Series, vid: pd.Series, idx: pd.Series
) -> pd.DataFrame:
    from ..multimodal.jpeg import jpeg_decode, jpeg_dims, make_photo

    rows = []
    for b, ow, oh, v, i in zip(frame, w, h, vid, idx):
        payload = bytes(b)
        dims = jpeg_dims(payload)
        dims_ok = dims == (int(ow), int(oh))
        dec = jpeg_decode(payload)
        if dec is None:
            rows.append((dims_ok, False))
            continue
        # the corpus seed is derived from the id (make_avi contract)
        expected = make_photo(int(ow), int(oh), (int(v) % 251 + 31 * int(i)) % 251)
        err = float(np.abs(dec.astype(np.int64) - expected.astype(np.int64)).mean())
        rows.append((dims_ok, err <= _AVI_FIDELITY_BOUND))
    return pd.DataFrame(rows, columns=["dims_ok", "fidelity_ok"])


def _avi_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every 25th part: each video is n_frames full JPEG encode+decode
    # passes — the per-row cost of m18 multiplied by the frame count
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 0))
    corrupt = F.col("p_partkey") % 97 == 0
    w = (16 + F.pmod(F.col("p_size"), F.lit(12)) * 4).cast("int")
    h = (12 + F.pmod(F.col("p_size"), F.lit(8)) * 4).cast("int")
    fps = (12 + F.pmod(F.col("p_size"), F.lit(3)) * 6).cast("int")
    n = (3 + F.pmod(F.col("p_size"), F.lit(6))).cast("int")
    seed = F.pmod(F.col("p_partkey"), F.lit(251)).cast("int")
    return part.select(
        F.col("p_partkey").alias("video_id"),
        F.when(corrupt, F.lit(b"RIFF\x00\x00\x00\x00AVI corrupt-body"))
        .otherwise(_gen_avi(w, h, fps, n, seed))
        .alias("content"),
    )


def m20_avi_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.av import sample_frames, video_metadata

    # Generation is the query's dominant cost (every frame is a full
    # JPEG encode in _gen_avi); meta and frames both branch off `vids`,
    # and without a pin the optimizer re-expands the scan+gen subtree
    # into BOTH branches — the corpus was synthesized twice per run
    # (plan-audited: two ArrowEvalPython gen nodes over two scans).
    # The lazy localCheckpoint materializes it once and shares blocks.
    vids = _avi_corpus(spark, sf_dir).localCheckpoint(eager=False)
    meta = vids.select(
        "video_id", video_metadata(F.col("content")).alias("m")
    )
    frames = sample_frames(vids, id_col="video_id", every_n=2)
    checked = frames.select(
        "video_id",
        "frame_idx",
        _avi_frame_checks(
            F.col("frame"), F.col("width"), F.col("height"),
            F.col("video_id"), F.col("frame_idx"),
        ).alias("c"),
    )
    per_vid = checked.groupBy("video_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("frame_idx").cast("long").alias("idx_sum"),
        F.min("c.dims_ok").alias("dims_ok"),
        F.min("c.fidelity_ok").alias("fidelity_ok"),
    )
    return (
        meta.join(per_vid, "video_id", "left")
        .select(
            F.col("video_id").alias("p_partkey"),
            F.when(F.col("m.width").isNull(), F.lit("unreadable"))
            .otherwise(F.lit("ok"))
            .alias("status"),
            F.col("m.width").alias("width"),
            F.col("m.height").alias("height"),
            F.col("m.fps").alias("fps"),
            F.col("m.n_frames").alias("n_frames"),
            "n_sampled",
            "idx_sum",
            "dims_ok",
            "fidelity_ok",
        )
        .transform(_pin_for_sort)
        .orderBy("p_partkey")
    )


M20_SQL = """
WITH base AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              ELSE CAST(16 + (p_size % 12) * 4 AS INT) END AS w,
         CASE WHEN p_partkey % 97 = 0 THEN NULL
              ELSE CAST(12 + (p_size % 8) * 4 AS INT) END AS h,
         CAST(12 + (p_size % 3) * 6 AS INT) AS fps,
         CAST(3 + p_size % 6 AS INT) AS n
  FROM part
  WHERE p_partkey % 25 = 0
)
SELECT p_partkey,
       CASE WHEN w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       w AS width,
       h AS height,
       CASE WHEN w IS NULL THEN NULL ELSE fps END AS fps,
       CASE WHEN w IS NULL THEN NULL ELSE n END AS n_frames,
       -- every_n = 2 samples indices 0,2,4,...: count = ceil(n/2) = k
       CAST(CASE WHEN w IS NULL THEN NULL ELSE (n + 1) // 2 END AS BIGINT)
         AS n_sampled,
       -- sum of 0+2+...+2(k-1) = k*(k-1)
       CAST(CASE WHEN w IS NULL THEN NULL
                 ELSE ((n + 1) // 2) * ((n + 1) // 2 - 1) END AS BIGINT)
         AS idx_sum,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS dims_ok,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS fidelity_ok
FROM base
ORDER BY p_partkey
"""

QUERIES["m20_avi_frame_sample"] = m20_avi_frame_sample
ORACLES["m20_avi_frame_sample"] = M20_SQL


# --------------------------------------------------------------------------
# M21 — REAL video frame sampling in the SECOND container family:
# MJPEG-in-MOV/QuickTime (multimodal/mov.py — the hand-walked
# ftyp/mdat/moov box tree with stsd/stts/stsc/stsz/stco sample
# tables; MP4 is the ISO-BMFF descendant of this structure). Same
# m20 discipline end-to-end: container metadata, sampled-index set,
# per-frame JPEG dims, and the fidelity gate are oracle-exact; the
# frame payload contract (stsz/stco slices are complete JPEGs whose
# decoded pixels match the deterministic photo) is checked by the same
# _avi_frame_checks UDF because make_mov shares make_avi's seed
# contract. Corrupt rows open with a plausible 'ftyp' box whose moov
# is garbage — the guard exercised inside the box walker. Disjoint
# part slice from m20 (% 25 == 7 vs == 0).
# --------------------------------------------------------------------------
@pandas_udf(T.BinaryType())
def _gen_mov(w: pd.Series, h: pd.Series, fps: pd.Series, n: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.mov import make_mov

    return pd.Series(
        [
            None
            if pd.isna(a)
            else make_mov(int(a), int(b), int(f), int(k), int(s))
            for a, b, f, k, s in zip(w, h, fps, n, seed)
        ],
        dtype=object,
    )


def _mov_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 7))
    corrupt = F.col("p_partkey") % 89 == 0
    w = (16 + F.pmod(F.col("p_size"), F.lit(12)) * 4).cast("int")
    h = (12 + F.pmod(F.col("p_size"), F.lit(8)) * 4).cast("int")
    fps = (12 + F.pmod(F.col("p_size"), F.lit(3)) * 6).cast("int")
    n = (3 + F.pmod(F.col("p_size"), F.lit(6))).cast("int")
    seed = F.pmod(F.col("p_partkey"), F.lit(251)).cast("int")
    return part.select(
        F.col("p_partkey").alias("video_id"),
        F.when(
            corrupt,
            # valid ftyp box + truncated garbage moov: exercises the
            # box walker's structural guards, not just the magic check
            F.lit(b"\x00\x00\x00\x14ftypqt  \x00\x00\x02\x00qt  \x00\x00\x00\x20moovgarbage"),
        )
        .otherwise(_gen_mov(w, h, fps, n, seed))
        .alias("content"),
    )


def m21_mov_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.av import sample_frames, video_metadata

    # single-generation pin — see m20 (two branches, one gen pass)
    vids = _mov_corpus(spark, sf_dir).localCheckpoint(eager=False)
    meta = vids.select("video_id", video_metadata(F.col("content")).alias("m"))
    frames = sample_frames(vids, id_col="video_id", every_n=2)
    checked = frames.select(
        "video_id",
        "frame_idx",
        _avi_frame_checks(
            F.col("frame"), F.col("width"), F.col("height"),
            F.col("video_id"), F.col("frame_idx"),
        ).alias("c"),
    )
    per_vid = checked.groupBy("video_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("frame_idx").cast("long").alias("idx_sum"),
        F.min("c.dims_ok").alias("dims_ok"),
        F.min("c.fidelity_ok").alias("fidelity_ok"),
    )
    return (
        meta.join(per_vid, "video_id", "left")
        .select(
            F.col("video_id").alias("p_partkey"),
            F.when(F.col("m.width").isNull(), F.lit("unreadable"))
            .otherwise(F.lit("ok"))
            .alias("status"),
            F.col("m.width").alias("width"),
            F.col("m.height").alias("height"),
            F.col("m.fps").alias("fps"),
            F.col("m.n_frames").alias("n_frames"),
            "n_sampled",
            "idx_sum",
            "dims_ok",
            "fidelity_ok",
        )
        .transform(_pin_for_sort)
        .orderBy("p_partkey")
    )


M21_SQL = """
WITH base AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 89 = 0 THEN NULL
              ELSE CAST(16 + (p_size % 12) * 4 AS INT) END AS w,
         CASE WHEN p_partkey % 89 = 0 THEN NULL
              ELSE CAST(12 + (p_size % 8) * 4 AS INT) END AS h,
         CAST(12 + (p_size % 3) * 6 AS INT) AS fps,
         CAST(3 + p_size % 6 AS INT) AS n
  FROM part
  WHERE p_partkey % 25 = 7
)
SELECT p_partkey,
       CASE WHEN w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       w AS width,
       h AS height,
       CASE WHEN w IS NULL THEN NULL ELSE fps END AS fps,
       CASE WHEN w IS NULL THEN NULL ELSE n END AS n_frames,
       CAST(CASE WHEN w IS NULL THEN NULL ELSE (n + 1) // 2 END AS BIGINT)
         AS n_sampled,
       CAST(CASE WHEN w IS NULL THEN NULL
                 ELSE ((n + 1) // 2) * ((n + 1) // 2 - 1) END AS BIGINT)
         AS idx_sum,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS dims_ok,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS fidelity_ok
FROM base
ORDER BY p_partkey
"""

QUERIES["m21_mov_frame_sample"] = m21_mov_frame_sample
ORACLES["m21_mov_frame_sample"] = M21_SQL


# --------------------------------------------------------------------------
# M22 — REAL video frame sampling in the THIRD container layout:
# MJPEG-in-FRAGMENTED-MP4 (multimodal/fmp4.py — the moof/mfhd/tfhd/
# tfdt/trun movie-fragment machinery over the same ISO-BMFF box walk
# mov.py hand-parses; VERDICT r9 #6). This is the layout streaming
# corpora actually arrive in (DASH/HLS/CMAF segments): the moov's
# sample tables are EMPTY and every sample is addressed by per-
# fragment trun entries relative to a tfhd base. Same m20/m21
# discipline end-to-end: container metadata, sampled-index set,
# per-frame JPEG dims, and the fidelity gate are oracle-exact; the
# same _avi_frame_checks UDF applies because make_fmp4 shares the
# make_avi/make_mov seed contract. Corrupt rows are a REAL fmp4
# truncated mid-mdat — the final trun's (offset, size) slice lands
# past EOF, exercising the fragment walker's bounds guard (deeper
# than a garbage-moov magic check). Disjoint part slice (% 25 == 11
# vs m20's == 0 and m21's == 7); corrupt stripe % 83.
# --------------------------------------------------------------------------
@pandas_udf(T.BinaryType())
def _gen_fmp4(w: pd.Series, h: pd.Series, fps: pd.Series, n: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.fmp4 import make_fmp4

    return pd.Series(
        [
            None
            if pd.isna(a)
            else make_fmp4(int(a), int(b), int(f), int(k), int(s))
            for a, b, f, k, s in zip(w, h, fps, n, seed)
        ],
        dtype=object,
    )


def _fmp4_corrupt_literal() -> bytes:
    """A structurally plausible fragmented MP4 whose final mdat is
    truncated: ftyp/moov/mvex all parse, the last trun's sample slice
    points past EOF — the deepest unreadable path in fmp4._fragments."""
    from ..multimodal.fmp4 import make_fmp4

    return make_fmp4(16, 12, 12, 3, seed=7)[:-10]


def _fmp4_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 11))
    corrupt = F.col("p_partkey") % 83 == 0
    w = (16 + F.pmod(F.col("p_size"), F.lit(12)) * 4).cast("int")
    h = (12 + F.pmod(F.col("p_size"), F.lit(8)) * 4).cast("int")
    fps = (12 + F.pmod(F.col("p_size"), F.lit(3)) * 6).cast("int")
    n = (3 + F.pmod(F.col("p_size"), F.lit(6))).cast("int")
    seed = F.pmod(F.col("p_partkey"), F.lit(251)).cast("int")
    return part.select(
        F.col("p_partkey").alias("video_id"),
        F.when(corrupt, F.lit(_fmp4_corrupt_literal()))
        .otherwise(_gen_fmp4(w, h, fps, n, seed))
        .alias("content"),
    )


def m22_fmp4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.av import sample_frames, video_metadata

    # single-generation pin — see m20 (two branches, one gen pass)
    vids = _fmp4_corpus(spark, sf_dir).localCheckpoint(eager=False)
    meta = vids.select("video_id", video_metadata(F.col("content")).alias("m"))
    frames = sample_frames(vids, id_col="video_id", every_n=2)
    checked = frames.select(
        "video_id",
        "frame_idx",
        _avi_frame_checks(
            F.col("frame"), F.col("width"), F.col("height"),
            F.col("video_id"), F.col("frame_idx"),
        ).alias("c"),
    )
    per_vid = checked.groupBy("video_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("frame_idx").cast("long").alias("idx_sum"),
        F.min("c.dims_ok").alias("dims_ok"),
        F.min("c.fidelity_ok").alias("fidelity_ok"),
    )
    return (
        meta.join(per_vid, "video_id", "left")
        .select(
            F.col("video_id").alias("p_partkey"),
            F.when(F.col("m.width").isNull(), F.lit("unreadable"))
            .otherwise(F.lit("ok"))
            .alias("status"),
            F.col("m.width").alias("width"),
            F.col("m.height").alias("height"),
            F.col("m.fps").alias("fps"),
            F.col("m.n_frames").alias("n_frames"),
            "n_sampled",
            "idx_sum",
            "dims_ok",
            "fidelity_ok",
        )
        .transform(_pin_for_sort)
        .orderBy("p_partkey")
    )


M22_SQL = """
WITH base AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 83 = 0 THEN NULL
              ELSE CAST(16 + (p_size % 12) * 4 AS INT) END AS w,
         CASE WHEN p_partkey % 83 = 0 THEN NULL
              ELSE CAST(12 + (p_size % 8) * 4 AS INT) END AS h,
         CAST(12 + (p_size % 3) * 6 AS INT) AS fps,
         CAST(3 + p_size % 6 AS INT) AS n
  FROM part
  WHERE p_partkey % 25 = 11
)
SELECT p_partkey,
       CASE WHEN w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       w AS width,
       h AS height,
       CASE WHEN w IS NULL THEN NULL ELSE fps END AS fps,
       CASE WHEN w IS NULL THEN NULL ELSE n END AS n_frames,
       CAST(CASE WHEN w IS NULL THEN NULL ELSE (n + 1) // 2 END AS BIGINT)
         AS n_sampled,
       CAST(CASE WHEN w IS NULL THEN NULL
                 ELSE ((n + 1) // 2) * ((n + 1) // 2 - 1) END AS BIGINT)
         AS idx_sum,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS dims_ok,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS fidelity_ok
FROM base
ORDER BY p_partkey
"""

QUERIES["m22_fmp4_frame_sample"] = m22_fmp4_frame_sample
ORACLES["m22_fmp4_frame_sample"] = M22_SQL


# --------------------------------------------------------------------------
# M23 — REAL video frame sampling in the FOURTH container layout:
# MJPEG-in-MKV (multimodal/mkv.py — the EBML/Matroska tag-length-value
# element tree, the third container *family* after RIFF and ISO-BMFF;
# VERDICT r9 "what's missing" #3 closes here). Same m20/m21/m22
# discipline end-to-end: container metadata, sampled-index set,
# per-frame JPEG dims, and the fidelity gate are oracle-exact; the
# same _avi_frame_checks UDF applies because make_mkv shares the
# make_avi/make_mov seed contract. Corrupt rows are a REAL mkv
# truncated mid-cluster — the Segment's declared size lands past EOF,
# exercising the EBML walker's size-bound guard (deeper than a magic
# check). Disjoint part slice (% 25 == 14 vs m20's == 0, m21's == 7,
# m22's == 11); corrupt stripe % 79.
# --------------------------------------------------------------------------
@pandas_udf(T.BinaryType())
def _gen_mkv(w: pd.Series, h: pd.Series, fps: pd.Series, n: pd.Series, seed: pd.Series) -> pd.Series:
    from ..multimodal.mkv import make_mkv

    return pd.Series(
        [
            None
            if pd.isna(a)
            else make_mkv(int(a), int(b), int(f), int(k), int(s))
            for a, b, f, k, s in zip(w, h, fps, n, seed)
        ],
        dtype=object,
    )


def _mkv_corrupt_literal() -> bytes:
    """A REAL mkv truncated mid-cluster: the Segment's declared size
    points past EOF, so the EBML walker's bound guard abstains."""
    from ..multimodal.mkv import make_mkv

    whole = make_mkv(16, 12, 12, 3, seed=5)
    return whole[: len(whole) - 40]


def _mkv_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _widen(load(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 14))
    corrupt = F.col("p_partkey") % 79 == 0
    w = (16 + F.pmod(F.col("p_size"), F.lit(12)) * 4).cast("int")
    h = (12 + F.pmod(F.col("p_size"), F.lit(8)) * 4).cast("int")
    fps = (12 + F.pmod(F.col("p_size"), F.lit(3)) * 6).cast("int")
    n = (3 + F.pmod(F.col("p_size"), F.lit(6))).cast("int")
    seed = F.pmod(F.col("p_partkey"), F.lit(251)).cast("int")
    return part.select(
        F.col("p_partkey").alias("video_id"),
        F.when(corrupt, F.lit(_mkv_corrupt_literal()))
        .otherwise(_gen_mkv(w, h, fps, n, seed))
        .alias("content"),
    )


def m23_mkv_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.av import sample_frames, video_metadata

    # single-generation pin — see m20 (two branches, one gen pass)
    vids = _mkv_corpus(spark, sf_dir).localCheckpoint(eager=False)
    meta = vids.select("video_id", video_metadata(F.col("content")).alias("m"))
    frames = sample_frames(vids, id_col="video_id", every_n=2)
    checked = frames.select(
        "video_id",
        "frame_idx",
        _avi_frame_checks(
            F.col("frame"), F.col("width"), F.col("height"),
            F.col("video_id"), F.col("frame_idx"),
        ).alias("c"),
    )
    per_vid = checked.groupBy("video_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("frame_idx").cast("long").alias("idx_sum"),
        F.min("c.dims_ok").alias("dims_ok"),
        F.min("c.fidelity_ok").alias("fidelity_ok"),
    )
    return (
        meta.join(per_vid, "video_id", "left")
        .select(
            F.col("video_id").alias("p_partkey"),
            F.when(F.col("m.width").isNull(), F.lit("unreadable"))
            .otherwise(F.lit("ok"))
            .alias("status"),
            F.col("m.width").alias("width"),
            F.col("m.height").alias("height"),
            F.col("m.fps").alias("fps"),
            F.col("m.n_frames").alias("n_frames"),
            "n_sampled",
            "idx_sum",
            "dims_ok",
            "fidelity_ok",
        )
        .transform(_pin_for_sort)
        .orderBy("p_partkey")
    )


M23_SQL = """
WITH base AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 79 = 0 THEN NULL
              ELSE CAST(16 + (p_size % 12) * 4 AS INT) END AS w,
         CASE WHEN p_partkey % 79 = 0 THEN NULL
              ELSE CAST(12 + (p_size % 8) * 4 AS INT) END AS h,
         CAST(12 + (p_size % 3) * 6 AS INT) AS fps,
         CAST(3 + p_size % 6 AS INT) AS n
  FROM part
  WHERE p_partkey % 25 = 14
)
SELECT p_partkey,
       CASE WHEN w IS NULL THEN 'unreadable' ELSE 'ok' END AS status,
       w AS width,
       h AS height,
       CASE WHEN w IS NULL THEN NULL ELSE fps END AS fps,
       CASE WHEN w IS NULL THEN NULL ELSE n END AS n_frames,
       CAST(CASE WHEN w IS NULL THEN NULL ELSE (n + 1) // 2 END AS BIGINT)
         AS n_sampled,
       CAST(CASE WHEN w IS NULL THEN NULL
                 ELSE ((n + 1) // 2) * ((n + 1) // 2 - 1) END AS BIGINT)
         AS idx_sum,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS dims_ok,
       CASE WHEN w IS NULL THEN NULL ELSE TRUE END AS fidelity_ok
FROM base
ORDER BY p_partkey
"""

QUERIES["m23_mkv_frame_sample"] = m23_mkv_frame_sample
ORACLES["m23_mkv_frame_sample"] = M23_SQL
