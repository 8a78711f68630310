"""JSONL source (training-data mandate: corpora arrive as JSON-lines
long before they are parquet).

Spark-native: `spark.read.json` with an EXPLICIT schema (inference
costs a full extra pass at 100 TB and can silently widen types between
runs) and PERMISSIVE corrupt-record capture — a malformed line becomes
a row whose corrupt column holds the raw text instead of failing the
job, the same skip-and-continue posture as the image pipeline's
unreadable guard (M3).

Known Spark wrinkle handled here: a query that references ONLY the
corrupt-record column raises AnalysisException by design (the pushed
projection would never parse the good columns, so the corrupt column
would be empty); `split_corrupt` caches the parsed frame before
filtering, the documented pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSON-lines with an explicit schema. PERMISSIVE (default)
    captures malformed lines in `_corrupt_record`; pass mode='FAILFAST'
    to abort on the first bad line instead."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, corrupt_rows). Cached first —
    Spark refuses corrupt-column-only filters on the raw relation."""
    cached = df.cache()
    good = cached.filter(cached[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = cached.filter(cached[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return good, bad
