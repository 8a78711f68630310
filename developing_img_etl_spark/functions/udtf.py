"""Python UDTF surface (SURVEY.md §2.10): one-row→many-rows expansion.

The reference's per-row photo loop (/root/reference/test.py:128-134) is
a hand-rolled UDTF. The engine's PRIMARY unpivot is pure Catalyst
(operators/unpivot.py — always prefer it); this module demonstrates the
Spark 4 @udtf escape hatch for expansions that genuinely need imperative
Python, with the same photo-pair semantics as the worked example.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, url string, description string")
class ExplodePhotoPairs:
    """Yield one row per non-null (url, description) pair.

    Arguments: up to 8 url values followed by the same number of
    descriptions (pass columns positionally). Null URLs are skipped —
    the null-skip of test.py:136-137; missing description → ''
    (test.py:134 row.get default).
    """

    def eval(self, *cols):  # noqa: D102
        n = len(cols) // 2
        urls, descs = cols[:n], cols[n:]
        for i, (u, d) in enumerate(zip(urls, descs), start=1):
            if u is not None and str(u).strip():
                yield i, u, d if d is not None else ""
