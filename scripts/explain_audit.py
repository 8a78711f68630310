"""Physical-plan audit (SURVEY.md §4 / the 100 TB checklist).

For every declared query, prints: scan pushdown (PushedFilters /
ReadSchema width), join strategies chosen, exchange (shuffle) count,
and whole-stage-codegen span count. Run after any plan-shape change.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from developing_img_etl_spark.queries import all_queries
from developing_img_etl_spark.session import get_spark


def audit(name: str, plan: str) -> str:
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)", plan
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed_n = sum(1 for p in pushed if p.strip())
    exchanges = len(re.findall(r"Exchange ", plan))
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    widths = [len(s.split(",")) if s else 0 for s in scans]
    return (
        f"{name}: joins={joins or '-'} pushedFilterScans={pushed_n}/{len(pushed)} "
        f"shuffles={exchanges} codegenSpans={codegen} scanWidths={widths}"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("audit", cpus=8)
    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        if name.startswith("st"):
            continue  # streaming: no batch plan to audit
        try:
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            formatted = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            n_codegen = formatted.count("WholeStageCodegen")
            print(audit(name, plan) + f" wholeStageCodegen={n_codegen}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: AUDIT-ERROR {str(e)[:120]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
