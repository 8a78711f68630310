"""Property tests for the round-3b operators: sequence packing, SCD-1
merge, Z-order interleaving, and PII redaction — the paths the q33-q38
oracles can't see (xxhash64 production hash, delete/error paths, bit
arithmetic vs a Python reference)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from developing_img_etl_spark.catalog import load
from developing_img_etl_spark.operators.merge import merge_upsert
from developing_img_etl_spark.operators.packing import pack_sequences
from developing_img_etl_spark.operators.zorder import zorder_layout, zvalue

BUDGET = 4096


# ---------------------------------------------------------------------------
# pack_sequences (xxhash64 production path)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = pack_sequences(docs, "doc_id", "n_chars", BUDGET, n_groups=8).select(
        "doc_id", "n_chars", "pack_group", "pack_id", "pack_pos"
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    return rows


def test_packing_deterministic_under_repartition(spark, sf_dir, packed):
    docs = load(spark, sf_dir, "documents").repartition(17)
    again = {
        r["doc_id"]: (r["pack_group"], r["pack_id"], r["pack_pos"])
        for r in pack_sequences(docs, "doc_id", "n_chars", BUDGET, n_groups=8)
        .select("doc_id", "pack_group", "pack_id", "pack_pos")
        .collect()
    }
    for r in packed:
        assert again[r["doc_id"]] == (r["pack_group"], r["pack_id"], r["pack_pos"])


def test_packing_budget_contract(packed):
    """pack_id is BY DEFINITION exclusive_prefix_tokens DIV budget in
    the group's pack_pos order (so packs are contiguous, each covering
    one budget-sized band of the token stream), and a pack overflows
    BUDGET by at most its straddling row."""
    from collections import defaultdict

    groups = defaultdict(list)
    for r in packed:
        groups[r["pack_group"]].append(r)
    for g, rows in groups.items():
        rows.sort(key=lambda r: r["pack_pos"])
        assert [r["pack_pos"] for r in rows] == list(range(len(rows)))
        cum = 0
        tokens = defaultdict(int)
        last_tok = {}
        for r in rows:
            assert r["pack_id"] == cum // BUDGET
            cum += r["n_chars"]
            tokens[r["pack_id"]] += r["n_chars"]
            last_tok[r["pack_id"]] = r["n_chars"]
        for pid, tot in tokens.items():
            assert tot <= BUDGET + last_tok[pid]


def test_packing_rejects_bad_args(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n_chars", 0)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n_chars", 100, n_groups=0)


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------
def _mini_tables(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k INT, name STRING, v DOUBLE"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 22.0, False), (4, "d", 40.0, False), (3, "c", 30.0, True)],
        "k INT, name STRING, v DOUBLE, del BOOLEAN",
    )
    return target, updates


def test_merge_upsert_semantics(spark):
    target, updates = _mini_tables(spark)
    got = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(target, updates, "k", delete_col="del").collect()
    }
    # 1 untouched, 2 replaced, 3 tombstoned away, 4 inserted
    assert got == {1: ("a", 10.0), 2: ("b2", 22.0), 4: ("d", 40.0)}


def test_merge_upsert_without_deletes(spark):
    target, updates = _mini_tables(spark)
    got = {
        r["k"]: r["name"]
        for r in merge_upsert(target, updates.drop("del"), "k").collect()
    }
    assert got == {1: "a", 2: "b2", 3: "c", 4: "d"}


def test_merge_upsert_schema_drift_raises(spark):
    target, updates = _mini_tables(spark)
    with pytest.raises(ValueError, match="schema drift"):
        merge_upsert(target, updates.drop("name"), "k", delete_col="del")
    with pytest.raises(ValueError, match="schema drift"):
        merge_upsert(target, updates, "k")  # stray del column, no delete_col


# ---------------------------------------------------------------------------
# zvalue / zorder_layout
# ---------------------------------------------------------------------------
def _py_morton2(x: int, y: int) -> int:
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def _py_morton3(x: int, y: int, z: int) -> int:
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_zvalue_matches_python_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(cases, "x INT, y INT").withColumn(
        "z", zvalue(["x", "y"])
    )
    for r in df.collect():
        assert r["z"] == _py_morton2(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue3_matches_python_reference(spark):
    cases = [(0, 0, 0), (1023, 1023, 1023), (12, 345, 678), (1, 2, 4)]
    df = spark.createDataFrame(cases, "x INT, y INT, zc INT").withColumn(
        "z", zvalue(["x", "y", "zc"])
    )
    for r in df.collect():
        assert r["z"] == _py_morton3(r["x"], r["y"], r["zc"])
    with pytest.raises(ValueError):
        zvalue(["x"])


def test_zorder_layout_partitions_are_disjoint_ranges(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        F.pmod("o_custkey", F.lit(4096)).cast("int").alias("x"),
        F.pmod("o_orderkey", F.lit(4096)).cast("int").alias("y"),
    )
    laid = zorder_layout(o, ["x", "y"], n_files=8)
    spans = (
        laid.withColumn("z", zvalue(["x", "y"]))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(spans) > 1
    for a, b in zip(spans, spans[1:]):
        assert a["hi"] <= b["lo"]  # ranges never interleave


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
def test_pii_redaction_is_complete_and_targeted(spark):
    from developing_img_etl_spark.functions import pii as PII

    rows = [
        ("mail me at bob.smith+x@corp.example.co or 555-123-4567",),
        ("server 192.168.0.1 and 10.0.0.255 up",),
        ("clean text, no pii at all",),
        ("v1.2.3.4 release",),  # version string — matches IPV4 shape by design
    ]
    df = spark.createDataFrame(rows, "t STRING").select(
        PII.email_count(F.col("t")).alias("e"),
        PII.phone_count(F.col("t")).alias("p"),
        PII.ipv4_count(F.col("t")).alias("i"),
        PII.redact(F.col("t")).alias("r"),
        PII.email_count(PII.redact(F.col("t"))).alias("re"),
        PII.phone_count(PII.redact(F.col("t"))).alias("rp"),
        PII.ipv4_count(PII.redact(F.col("t"))).alias("ri"),
    )
    got = df.collect()
    assert [(r["e"], r["p"], r["i"]) for r in got] == [
        (1, 1, 0),
        (0, 0, 2),
        (0, 0, 0),
        (0, 0, 1),
    ]
    # redaction removes every detectable match and nothing else survives
    for r in got:
        assert (r["re"], r["rp"], r["ri"]) == (0, 0, 0)
    assert got[0]["r"] == "mail me at <EMAIL> or <PHONE>"
    assert got[2]["r"] == "clean text, no pii at all"


# -- incremental view maintenance (operators/ivm.py) ------------------------


def test_ivm_refresh_equals_recompute(spark):
    from pyspark.sql import functions as F

    from developing_img_etl_spark.operators.ivm import (
        build_view,
        delta_aggregate,
        incremental_refresh,
    )

    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0), ("b", 7.0), ("c", 1.0)],
        "g STRING, x DOUBLE",
    )
    view = build_view(base, ["g"], ["x"])
    # retract one 'a' row and the ONLY 'c' row; insert new 'b' and 'd' rows
    delta = spark.createDataFrame(
        [("a", 20.0, -1), ("c", 1.0, -1), ("b", 3.0, 1), ("d", 9.0, 1)],
        "g STRING, x DOUBLE, s INT",
    )
    refreshed = incremental_refresh(
        view, delta_aggregate(delta, ["g"], ["x"], sign_col="s"), ["g"], ["x"]
    )
    got = {
        r.g: (r.n, float(r.x)) for r in refreshed.collect()
    }
    # equals a from-scratch recompute of the post-delta base
    assert got == {"a": (1, 10.0), "b": (3, 15.0), "d": (1, 9.0)}
    assert "c" not in got  # emptied group dropped


def test_ivm_unsigned_delta_defaults_to_inserts(spark):
    from developing_img_etl_spark.operators.ivm import (
        build_view,
        delta_aggregate,
        incremental_refresh,
    )

    base = spark.createDataFrame([("a", 1.0)], "g STRING, x DOUBLE")
    delta = spark.createDataFrame([("a", 2.0), ("b", 3.0)], "g STRING, x DOUBLE")
    view = incremental_refresh(
        build_view(base, ["g"], ["x"]),
        delta_aggregate(delta, ["g"], ["x"]),
        ["g"],
        ["x"],
    )
    got = {r.g: (r.n, float(r.x)) for r in view.collect()}
    assert got == {"a": (2, 3.0), "b": (1, 3.0)}


# -- bloom semi-join reduction (operators/bloom.py) -------------------------


def test_bloom_never_false_negative_and_bounded_fp(spark):
    from pyspark.sql import functions as F

    from developing_img_etl_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.range(0, 50).select((F.col("id") * 13 + 1).alias("k"))
    words = bloom_build(keys, "k", m_bits=1024, k_hashes=3)
    # word frame is tiny and packed
    assert words.count() <= 1024 // 64
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    flagged = bloom_might_contain(probe, "k", words, m_bits=1024, k_hashes=3)
    rows = {r.k: r.bloom_pass for r in flagged.collect()}
    member = {i * 13 + 1 for i in range(50)}
    # no false negatives, ever
    assert all(rows[k] for k in member if k in rows)
    # false positives exist but are bounded (m/n/k chosen for ~<5%)
    fp = sum(1 for k, p in rows.items() if p and k not in member)
    assert fp / len(rows) < 0.05


def test_bloom_probe_plan_is_mapside(spark):
    from pyspark.sql import functions as F

    from developing_img_etl_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", m_bits=256, k_hashes=2)
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    plan = bloom_might_contain(
        probe, "k", words, m_bits=256, k_hashes=2
    )._jdf.queryExecution().executedPlan().toString()
    # the fact side joins the word frame by broadcast only — a shuffle of
    # the probe side would make the reduction pointless
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_ivm_sum_type_stable_across_cycles(spark):
    from developing_img_etl_spark.operators.ivm import (
        build_view,
        delta_aggregate,
        incremental_refresh,
    )

    base = spark.createDataFrame([("a", 1.0)], "g STRING, x DOUBLE")
    view = build_view(base, ["g"], ["x"])
    t0 = dict(view.dtypes)
    for i in range(3):  # refresh cycles must not widen the schema
        delta = spark.createDataFrame([("a", float(i))], "g STRING, x DOUBLE")
        view = incremental_refresh(
            view, delta_aggregate(delta, ["g"], ["x"]), ["g"], ["x"]
        )
        assert dict(view.dtypes) == t0
    row = view.collect()[0]
    assert (row.n, float(row.x)) == (4, 4.0)


def test_ivm_sign_is_signed_multiplicity(spark):
    from developing_img_etl_spark.operators.ivm import delta_aggregate

    delta = spark.createDataFrame(
        [("a", 10.0, 2), ("a", 3.0, 0), ("a", 5.0, -1)],
        "g STRING, x DOUBLE, s INT",
    )
    r = delta_aggregate(delta, ["g"], ["x"], sign_col="s").collect()[0]
    # count and sum stay CONSISTENT for any sign: 2+0-1 rows, 2*10+0*3-5
    assert (r.n, float(r.x)) == (1, 15.0)


def test_cms_never_underestimates_and_is_exact_when_wide(spark):
    from pyspark.sql import functions as F

    from developing_img_etl_spark.operators.cms import cms_build, cms_estimate

    keyed = spark.createDataFrame(
        [(k, (k * 7) % 13 + 1) for k in range(100)], "k LONG, n LONG"
    )
    # narrow sketch: collisions guaranteed (100 keys, 16 columns) — the
    # estimate must still never undercount any key
    cells = cms_build(keyed, "k", "n", depth=3, width=16)
    est = cms_estimate(keyed, "k", cells, depth=3, width=16)
    rows = est.collect()
    assert len(rows) == 100
    assert all(r.cms_est >= r.n for r in rows)
    assert any(r.cms_est > r.n for r in rows)  # narrow ⇒ real collisions
    # wide sketch: with ~no collisions every estimate is exact
    cells_w = cms_build(keyed, "k", "n", depth=3, width=4096)
    exact = cms_estimate(keyed, "k", cells_w, depth=3, width=4096)
    assert all(r.cms_est == r.n for r in exact.collect())


def test_cms_cells_merge_across_partitions(spark):
    """Cell-wise addition of two sketches == the sketch of the union —
    the mergeability that makes CMS a distributed/streaming structure."""
    from pyspark.sql import functions as F

    from developing_img_etl_spark.operators.cms import cms_build

    a = spark.createDataFrame([(k, 5) for k in range(0, 50)], "k LONG, n LONG")
    b = spark.createDataFrame([(k, 3) for k in range(25, 75)], "k LONG, n LONG")
    both = a.unionByName(b)
    merged = (
        cms_build(a, "k", "n", depth=2, width=32)
        .unionByName(cms_build(b, "k", "n", depth=2, width=32))
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(both, "k", "n", depth=2, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_semdedup_drops_exactly_the_planted_duplicates(spark, sf_dir):
    """Ground truth: the q31/q96 corpus plants every 10th vector under a
    new id; SemDeDup must drop precisely that planted set (the senior
    original survives) and nothing natural."""
    from developing_img_etl_spark.queries.similarity import (
        PLANT_EVERY,
        PLANT_OFFSET,
        q96_semdedup,
    )

    rows = q96_semdedup(spark, sf_dir).collect()
    n_base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    planted = list(range(0, n_base, PLANT_EVERY))
    assert sum(r.n_dropped for r in rows) == len(planted)
    # every planted copy carries the +PLANT_OFFSET id, so the dropped-id
    # sum identifies the dropped SET, not just its size
    assert sum(r.dropped_id_sum for r in rows) == sum(
        i + PLANT_OFFSET for i in planted
    )
    assert sum(r.n_members for r in rows) == n_base + len(planted)
