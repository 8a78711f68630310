"""Excel source (SURVEY.md §2.1 S1): the Forms-export reader
(/root/reference/test.py:113) and catalog reader (test.py:100-111).

Excel files are small driver-local artifacts by nature (a Forms export
is thousands of rows, not billions) — the right Spark shape is
driver-side pandas parse → createDataFrame with an explicit schema,
NOT a distributed source. Import is gated: the container may lack an
xlsx engine, in which case the caller gets a clear error instead of a
deep pandas stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_excel(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Excel source requires openpyxl (not installed in this "
            "container). Convert the workbook to parquet/csv, or install "
            "an xlsx engine."
        ) from e
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet_name, dtype=str)
    if schema is not None:
        return spark.createDataFrame(pdf[[f.name for f in schema.fields]], schema)
    return spark.createDataFrame(pdf)
