"""Ad-hoc single-query oracle check (the driver_sim comparison for a
named subset, at any SF) — the fast inner loop while optimizing.

Usage: python scripts/oracle_check.py [--sf /root/testdata/sf0.01] q21 q119 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from developing_img_etl_spark.queries import all_oracles, all_queries
from developing_img_etl_spark.session import get_spark
from tests.oracle_utils import assert_matches


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    q, o = all_queries(), all_oracles()
    names = []
    for a in args:
        full = [k for k in q if k == a or k.startswith(a + "_")]
        assert len(full) == 1, (a, full)
        names.append(full[0])
    spark = get_spark("oracle_check")
    bad = []
    for name in names:
        if name not in o:
            print(f"{name}: rows-only (no oracle), rows={q[name](spark, sf).count()}")
            continue
        try:
            assert_matches(q[name](spark, sf), o[name], sf)
            print(f"{name}: MATCH  [{sf}]")
        except AssertionError as e:
            bad.append(name)
            print(f"{name}: FAIL — {e}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
