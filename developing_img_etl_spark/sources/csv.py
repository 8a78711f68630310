"""CSV source (S14 — the other wire format corpora actually arrive in).

Same posture as the JSONL source: EXPLICIT schema (no inference pass),
PERMISSIVE corrupt-record capture so a malformed line becomes a row
instead of a dead job, FAILFAST available when the contract is strict.
Defaults handle the common real-world shape: header row, quoted fields
with embedded delimiters/newlines (multiLine).

Reuses jsonl.split_corrupt — the corrupt-column caching restriction is
identical for the CSV reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .jsonl import CORRUPT_COL, split_corrupt  # noqa: F401  (re-exported)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    sep: str = ",",
    multi_line: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read CSV with an explicit schema. PERMISSIVE (default) captures
    malformed lines in `_corrupt_record`; mode='FAILFAST' aborts on the
    first bad line. Note multiLine=True makes a file non-splittable
    (quoted newlines can cross block boundaries) — at 100 TB prefer
    many medium files over few huge ones, or multi_line=False when the
    data has no embedded newlines."""
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("multiLine", str(multi_line).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
