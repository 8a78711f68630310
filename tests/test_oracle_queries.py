"""Every declared query must hash-match its DuckDB oracle (SURVEY.md §2.11)."""

from __future__ import annotations

import pytest

from developing_img_etl_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    from tests.oracle_utils import assert_matches

    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        assert_matches(df, ORACLES[name], sf_dir, require_rows=True)
    else:
        # non-SQL-expressible: weaker rows-only check, mirroring the driver
        assert df.count() > 0
