"""String helpers mirroring the reference's key/path handling
(SURVEY.md §2.7 F1-F8), as composable Column functions.

The §1.4 normalization fix: the reference normalized `minggu` and the
filename (space→underscore, /root/reference/test.py:130,140) but NOT
`kode_proyek` (test.py:172), leaving duplicate partition trees on disk.
Here every partition key goes through normalize_name exactly once, at
ingest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_name(c: Column) -> Column:
    """space→underscore (test.py:130,140 semantics, applied uniformly)."""
    return F.translate(F.trim(c), " ", "_")


def url_basename(c: Column) -> Column:
    """URL-decode then take the path basename (test.py:139)."""
    return F.substring_index(F.url_decode(c), "/", -1)


def strip_ext(c: Column) -> Column:
    """Filename without its extension chain (test.py:159 split('.')[0])."""
    return F.substring_index(c, ".", 1)


def composite_key(*cols: Column | str) -> Column:
    """`{kode_proyek}_{minggu}_{nama_file}` dedup key (test.py:103-107)."""
    return F.concat_ws("_", *cols)


def raw_url(base: str, *path_cols: Column | str) -> Column:
    """Public raw-content URL for an uploaded object (test.py:93)."""
    return F.concat_ws("/", F.lit(base.rstrip("/")), *path_cols)


def size_kb(content_length: Column) -> Column:
    """bytes → KB rounded to 2dp (test.py:58-59)."""
    return F.round(content_length.cast("double") / 1024.0, 2)
