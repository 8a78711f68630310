"""UDTF, Excel-source gating, unpivot operator unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from developing_img_etl_spark.operators.unpivot import unpivot_groups


def test_udtf_photo_pairs(spark):
    from developing_img_etl_spark.functions.udtf import ExplodePhotoPairs

    df = spark.createDataFrame(
        [("k1", "u1", None, "d1", "d2")],
        "k string, f1 string, f2 string, g1 string, g2 string",
    )
    spark.udtf.register("explode_photo_pairs", ExplodePhotoPairs)
    df.createOrReplaceTempView("photos_wide")
    out = spark.sql(
        "SELECT k, p.* FROM photos_wide, "
        "LATERAL explode_photo_pairs(f1, f2, g1, g2) p"
    ).collect()
    assert [(r.k, r.pos, r.url, r.description) for r in out] == [("k1", 1, "u1", "d1")]


def test_unpivot_groups_rejects_ragged(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id int, x string, y string")
    with pytest.raises(ValueError, match="equal length"):
        unpivot_groups(df, ids=["id"], groups={"u": ["x", "y"], "v": ["x"]})


def test_unpivot_groups_order_and_values(spark):
    df = spark.createDataFrame([(1, "a", "b", "p", "q")], "id int, x1 string, x2 string, y1 string, y2 string")
    out = unpivot_groups(
        df, ids=["id"], groups={"u": ["x1", "x2"], "v": ["y1", "y2"]}
    ).orderBy("pos").collect()
    assert [(r.pos, r.u, r.v) for r in out] == [(1, "a", "p"), (2, "b", "q")]


def test_excel_source_gated(spark, tmp_path):
    from developing_img_etl_spark.sources.excel import read_excel

    try:
        import openpyxl  # noqa: F401

        has_engine = True
    except ImportError:
        has_engine = False

    if not has_engine:
        with pytest.raises(NotImplementedError, match="openpyxl"):
            read_excel(spark, str(tmp_path / "missing.xlsx"))
    else:
        import pandas as pd

        p = str(tmp_path / "t.xlsx")
        pd.DataFrame({"a": ["1", "2"], "b": ["x", "y"]}).to_excel(p, index=False)
        assert read_excel(spark, p).count() == 2


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """A5: HLL++ estimate within 3×rsd of exact (rsd=0.05)."""
    from developing_img_etl_spark.queries.relational import q17_approx_distinct

    for r in q17_approx_distinct(spark, sf_dir).collect():
        rel_err = abs(r.approx_customers - r.exact_customers) / max(r.exact_customers, 1)
        assert rel_err <= 0.15, f"{r.o_orderpriority}: rel_err={rel_err:.3f}"
