"""Compare two bench JSON artifacts per query (the judge's
round-over-round check, runnable locally before the snapshot).

Usage: python scripts/bench_compare.py BENCH_r09.json BENCH_LOCAL.json
Prints: common-subset totals, biggest regressions/improvements, and
queries present in only one artifact.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = json.load(open(a_path))["queries"]
    b = json.load(open(b_path))["queries"]
    common = sorted(set(a) & set(b))
    ta = sum(a[q] for q in common)
    tb = sum(b[q] for q in common)
    deltas = sorted(((b[q] - a[q], q) for q in common), reverse=True)
    print(
        f"common {len(common)}: {a_path} {ta:.1f}s -> {b_path} {tb:.1f}s "
        f"({tb / ta:.2f}x)"
    )
    print("worst regressions:")
    for d, q in deltas[:8]:
        if d <= 0.2:
            break
        print(f"  {q}: {a[q]:.2f}s -> {b[q]:.2f}s (+{d:.2f}s)")
    print("best improvements:")
    for d, q in sorted(deltas)[:8]:
        if d >= -0.2:
            break
        print(f"  {q}: {a[q]:.2f}s -> {b[q]:.2f}s ({d:.2f}s)")
    only_b = sorted(set(b) - set(a))
    if only_b:
        tb_new = sum(b[q] for q in only_b)
        print(f"new in {b_path}: {len(only_b)} queries, {tb_new:.1f}s total")
    only_a = sorted(set(a) - set(b))
    if only_a:
        print(f"dropped vs {a_path}: {only_a}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
