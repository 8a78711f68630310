"""End-to-end tests for the q151 corpus-build composition
(queries/corpus.py): stage hand-offs, manifest invariants, determinism,
and the S12 shard-writer driving the SAME sampled frame the declared
query hashes."""

from __future__ import annotations

import pyspark.sql.functions as F

from developing_img_etl_spark.queries.corpus import (
    _curated,
    corpus_sample,
    q151_corpus_build,
)


def test_q151_manifest_invariants(spark, sf_dir):
    sampled = corpus_sample(spark, sf_dir)
    n_sampled = sampled.count()
    n_curated = _curated(spark, sf_dir).count()
    assert 0 < n_sampled <= n_curated  # mix samples a strict-or-equal subset

    manifest = q151_corpus_build(spark, sf_dir).collect()
    assert sum(r.n_docs for r in manifest) == n_sampled  # every doc in a shard
    chars = sampled.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r.n_chars for r in manifest) == chars
    ids = sampled.agg(F.sum("doc_id")).collect()[0][0]
    assert sum(r.id_sum for r in manifest) == ids
    for r in manifest:
        assert r.n_packs >= 1 and r.min_id <= r.max_id


def test_q151_deterministic(spark, sf_dir):
    a = [tuple(r) for r in q151_corpus_build(spark, sf_dir).collect()]
    b = [tuple(r) for r in q151_corpus_build(spark, sf_dir).collect()]
    assert a == b


def test_corpus_sample_through_shard_writer(spark, sf_dir, tmp_path):
    """S12 composition: the sampled corpus written as deterministic
    shards round-trips completely and reproducibly."""
    from developing_img_etl_spark.sinks.shards import write_training_shards

    sampled = corpus_sample(spark, sf_dir)
    expect = sorted(r.doc_id for r in sampled.select("doc_id").collect())

    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(sampled, p1, n_shards=4, key_col="doc_id")
    write_training_shards(sampled, p2, n_shards=4, key_col="doc_id")
    back = spark.read.parquet(p1)
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == expect
    # byte-level reproducibility of shard contents (ignoring file names)
    rows1 = sorted(map(tuple, spark.read.parquet(p1).collect()))
    rows2 = sorted(map(tuple, spark.read.parquet(p2).collect()))
    assert rows1 == rows2
