"""Streaming surface tests (SURVEY.md §2.9): AvailableNow incremental
drain + idempotent foreachBatch, streaming windows == batch oracle
results, watermark dedup, REST sink contract.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from developing_img_etl_spark.catalog import load
from developing_img_etl_spark.streaming import incremental as INC
from developing_img_etl_spark.streaming import windows as W

PHOTO_SCHEMA = T.StructType(
    [
        T.StructField("kode_proyek", T.StringType()),
        T.StructField("minggu", T.StringType()),
        T.StructField("nama_file", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)


def _photo_rows(spark, n, start=0):
    return spark.createDataFrame(
        [
            (f"PRJ{i % 3}", str(7 + i % 2), f"img{start + i}.jpg", None)
            for i in range(n)
        ],
        PHOTO_SCHEMA,
    ).withColumn("ingest_ts", F.current_timestamp())


def test_available_now_incremental(spark, tmp_path):
    """Two triggers: second run drains ONLY newly arrived files; the
    idempotent writer never double-appends (test.py:100-111 contract)."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    _photo_rows(spark, 10).write.parquet(src)
    stream = INC.read_photo_stream(spark, src, PHOTO_SCHEMA)
    INC.start_incremental_append(
        stream, target_dir=target, checkpoint_dir=ckpt, spark=spark
    ).awaitTermination(120)
    assert spark.read.parquet(target).count() == 10

    # second batch: 5 new + 10 duplicates of already-written keys
    _photo_rows(spark, 5, start=100).write.mode("append").parquet(src)
    _photo_rows(spark, 10).write.mode("append").parquet(src)
    stream = INC.read_photo_stream(spark, src, PHOTO_SCHEMA)
    INC.start_incremental_append(
        stream, target_dir=target, checkpoint_dir=ckpt, spark=spark
    ).awaitTermination(120)
    out = spark.read.parquet(target)
    assert out.count() == 15  # duplicates suppressed by the anti-join
    assert out.select("kode_proyek", "minggu", "nama_file").distinct().count() == 15


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    """ST4 cross-check: the streaming aggregation over an AvailableNow
    drain must produce exactly the batch q11a numbers."""
    from developing_img_etl_spark.queries.streaming_batch import q11a_tumbling_window

    events = load(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = W.tumbling_counts(stream, watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w_start, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    want = {
        (r.w_start, r.n_events, r.sum_value)
        for r in q11a_tumbling_window(spark, sf_dir).collect()
    }
    assert got == want


def test_rest_sink_idempotent(spark, tmp_path):
    from developing_img_etl_spark.sinks.rest import LocalFsTransport, upload

    root = str(tmp_path / "store")
    os.makedirs(root, exist_ok=True)
    df = spark.createDataFrame(
        [(f"a/b/f{i}.bin", bytes([i]) * 64) for i in range(20)],
        "object_key string, content binary",
    )
    r1 = upload(df, lambda: LocalFsTransport(root)).groupBy("status").count().collect()
    assert {r.status: r["count"] for r in r1} == {"uploaded": 20}
    # re-run: content identical → all skipped, nothing rewritten
    r2 = upload(df, lambda: LocalFsTransport(root)).groupBy("status").count().collect()
    assert {r.status: r["count"] for r in r2} == {"skipped_identical": 20}
    # changed content → replaced
    df2 = df.withColumn("content", F.concat(F.col("content"), F.lit(b"x")))
    r3 = upload(df2, lambda: LocalFsTransport(root)).groupBy("status").count().collect()
    assert {r.status: r["count"] for r in r3} == {"uploaded": 20}


def test_rest_sink_retry_then_fail(spark, tmp_path):
    from developing_img_etl_spark.sinks import rest

    class Flaky(rest.LocalFsTransport):
        calls = 0

        def put(self, key, content):
            Flaky.calls += 1
            raise OSError("boom")

    root = str(tmp_path / "store2")
    os.makedirs(root, exist_ok=True)
    df = spark.createDataFrame([("k.bin", b"data")], "object_key string, content binary")
    out = rest.upload(df, lambda: Flaky(root), max_retries=2, backoff_s=0.0).collect()
    assert out[0].status == "failed" and out[0].attempts == 3


def test_stateful_user_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState totals across two micro-batches must equal
    the batch groupBy over the union of both."""
    from developing_img_etl_spark.streaming.stateful import user_totals

    events = load(spark, sf_dir, "events").select("user_id", "value", "ts")
    half1 = events.filter(F.col("user_id") % 2 == 0)
    half2 = events
    src = str(tmp_path / "ev_src")
    out_dir = str(tmp_path / "state_out")
    half1.write.parquet(src)

    def drain():
        # memory sink can't recover a stateful checkpoint — foreachBatch
        # to parquet is the recoverable shape (and the realistic one)
        def sink(batch, batch_id):
            batch.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

        stream = spark.readStream.schema(half1.schema).parquet(src)
        q = (
            user_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    half2.write.mode("append").parquet(src)
    drain()

    out = spark.read.parquet(out_dir)
    last_batch = out.agg(F.max("batch_id")).first()[0]
    final = out.filter(F.col("batch_id") == last_batch)
    cents = (F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + 0.5)).cast("long")
    expected = (
        half1.unionByName(half2)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("total_cents"))
    )
    got = {(r.user_id, r.n_events, r.total_cents) for r in final.collect()}
    want = {(r.user_id, r.n_events, r.total_cents) for r in expected.collect()}
    assert got == want


def test_late_data_dropped(spark, tmp_path):
    """ST5: rows older than the watermark are excluded from finalized
    windows in append mode."""
    import datetime as dt

    from developing_img_etl_spark.streaming.windows import tumbling_counts

    base = dt.datetime(2024, 1, 1)
    on_time = [(i, base + dt.timedelta(days=20), 1.0) for i in range(10)]
    late = [(99, base - dt.timedelta(days=30), 1.0)]  # far behind the watermark
    src = str(tmp_path / "late_src")
    spark.createDataFrame(on_time, "event_id long, ts timestamp, value double").write.parquet(src)

    out_dir = str(tmp_path / "late_out")

    def drain():
        def sink(batch, batch_id):
            batch.write.mode("append").parquet(out_dir)

        stream = spark.readStream.schema("event_id long, ts timestamp, value double").parquet(src)
        q = (
            tumbling_counts(stream, window="7 days", watermark="1 day")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "late_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    spark.createDataFrame(late, "event_id long, ts timestamp, value double").write.mode(
        "append"
    ).parquet(src)
    drain()
    rows = spark.read.parquet(out_dir).collect()
    # the late row's window (Dec 2023) must not appear: watermark already
    # advanced past it in batch 1
    assert all(r.w_start.year == 2024 for r in rows)


def test_corrupt_sink_fails_batch_not_double_append(spark, tmp_path):
    """A sink path that EXISTS but cannot be read must fail the batch —
    never be treated as 'first batch' (which would skip the idempotency
    anti-join and double-append). Guards the explicit FS-exists probe in
    start_incremental_append."""
    src = str(tmp_path / "src")
    target_dir = tmp_path / "target"
    ckpt = str(tmp_path / "ckpt")

    _photo_rows(spark, 5).write.parquet(src)
    # fabricate a corrupt sink: directory exists, file is not parquet
    target_dir.mkdir()
    (target_dir / "part-00000.parquet").write_bytes(b"not a parquet file")

    stream = INC.read_photo_stream(spark, src, PHOTO_SCHEMA)
    q = INC.start_incremental_append(
        stream, target_dir=str(target_dir), checkpoint_dir=ckpt, spark=spark
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)
        # StreamingQuery surfaces foreachBatch errors on stop/exception
        if q.exception() is not None:
            raise q.exception()
    # the corrupt marker is still the only file — nothing was appended
    names = [p.name for p in target_dir.iterdir() if not p.name.startswith((".", "_"))]
    assert names == ["part-00000.parquet"]


def test_transform_with_state_matches_st5_oracle(spark, sf_dir):
    """ST7: the transformWithStateInPandas implementation must produce
    the SAME result as applyInPandasWithState (both hash the ST5
    oracle). The API's state protocol needs google.protobuf; containers
    without it run on the vendored mini-runtime (vendor/protoshim),
    which conftest installs at collection time — so this test runs
    everywhere the driver path does, never skips."""
    import pytest

    from developing_img_etl_spark.queries.streaming_batch import (
        ST5_SQL,
        _tws_available,
        st7_transform_with_state,
    )

    # conftest installs vendor/protoshim at collection time, so the
    # protocol import must succeed here exactly as it does on the
    # driver path — a False from _tws_available() is a shim regression,
    # not an environment gap, and must FAIL rather than skip.
    assert _tws_available(), "vendor/protoshim failed to satisfy google.protobuf"
    from tests.oracle_utils import assert_matches

    df = st7_transform_with_state(spark, sf_dir)
    assert_matches(df, ST5_SQL, sf_dir, require_rows=True)


def test_ticks_source_offset_contract():
    """S16 reader protocol: batches tile [0, end) exactly, the replay
    path reproduces original rows bit-for-bit, and rows are pure
    functions of their offset."""
    from developing_img_etl_spark.sources.ticks_datasource import (
        _TicksStreamReader,
        _row,
    )

    r = _TicksStreamReader({"end": "25", "step": "10"})
    off = r.initialOffset()
    seen = []
    for _ in range(5):
        rows, nxt = r.read(off)
        rows = list(rows)
        assert [x[0] for x in rows] == list(range(off["i"], nxt["i"]))
        seen.extend(rows)
        if nxt == off:
            break
        off = nxt
    assert [x[0] for x in seen] == list(range(25))  # exact tiling, no dupes
    # replay path must be byte-identical to the original read
    assert list(r.readBetweenOffsets({"i": 7}, {"i": 19})) == [
        _row(i) for i in range(7, 19)
    ]
    # bounded source: reading at the end yields an empty batch, same offset
    rows, nxt = r.read({"i": 25})
    assert list(rows) == [] and nxt == {"i": 25}
