"""connected_components / dedup_clusters (operators/cluster.py, M15)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from developing_img_etl_spark.operators.cluster import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_components_and_triangle(spark):
    # chain 1-2-3, triangle 10-11-12 (+ redundant edge), isolated pair 20-21
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges_via_pointer_jumping(spark):
    # 64-node path: plain one-hop propagation needs ~63 rounds; pointer
    # jumping must land inside the operator's max_rounds=25 (O(log d)).
    edges = [(i, i + 1) for i in range(64)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(5, 1), (3, 5)]) == {1: 1, 3: 1, 5: 1}


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    edges = spark.createDataFrame([(0, 3), (3, 5)], ["id_a", "id_b"])
    rows = dedup_clusters(docs, edges).orderBy("doc_id").collect()
    assign = {r["doc_id"]: (r["component_id"], r["cluster_size"]) for r in rows}
    assert assign == {0: (0, 3), 1: (1, 1), 2: (2, 1), 3: (0, 3), 4: (4, 1), 5: (0, 3)}


def test_unconverged_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(8)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=1)


def test_q30_matches_oracle(spark, sf_dir):
    from developing_img_etl_spark.queries.dedup import Q30_SQL, q30_dedup_clusters
    from tests.oracle_utils import assert_matches

    assert_matches(q30_dedup_clusters(spark, sf_dir), Q30_SQL, sf_dir, require_rows=True)
