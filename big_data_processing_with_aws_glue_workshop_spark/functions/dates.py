"""Date standardization expressions (RN-001 family).

Reference semantics (src/silver/job-silver-rues.py:144-179): a string date
column may arrive as ``yyyyMMdd`` (8 digits), as a slash timestamp
``yyyy/MM/dd HH:mm:ss.SSSSSSSSS`` (9 fractional digits — Spark parses the
pattern and truncates beyond micros), or as garbage (-> NULL). Guards
(length/regex for format A, '/'-containment for format B) keep each parser
from even attempting the wrong shape.

All expressions are native Columns — whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FORMAT_COMPACT = "yyyyMMdd"
FORMAT_TS9 = "yyyy/MM/dd HH:mm:ss.SSSSSSSSS"


def compact_date(col: Column) -> Column:
    """8-digit ``yyyyMMdd`` -> date, NULL when the shape doesn't match.

    ``try_to_timestamp`` (not ``to_date``) so a regex-shaped but invalid
    value (e.g. month 13) yields NULL under ANSI-on instead of throwing —
    queries must not depend on session ANSI mode.
    """
    trimmed = F.trim(col.cast("string"))
    return F.when(
        (F.length(trimmed) == 8) & trimmed.rlike(r"^[0-9]{8}$"),
        F.to_date(F.try_to_timestamp(trimmed, F.lit(FORMAT_COMPACT))),
    )


def ts9_to_date(col: Column) -> Column:
    """Slash timestamp with 9 fractional digits -> date (time dropped).

    Slash strings without the fractional part (``1997/05/28 00:00:00``) must
    map to NULL, not raise — hence ``try_to_timestamp``, which is
    NULL-on-mismatch regardless of ``spark.sql.ansi.enabled``.
    """
    return F.when(
        col.cast("string").contains("/"),
        F.to_date(F.try_to_timestamp(col.cast("string"), F.lit(FORMAT_TS9))),
    )


def floor_time_bucket(col: Column, bucket_seconds: int) -> Column:
    """Epoch-aligned fixed-width time bucket START for a timestamp column.
    Uses floor(), not cast-to-long: casting truncates toward zero, which
    mis-buckets pre-epoch timestamps (DuckDB's time_bucket floors).
    Shared by the range join and the hierarchical time rollup."""
    return F.floor(F.unix_timestamp(col) / F.lit(bucket_seconds)).cast("long")


def multi_format_date(col: Column) -> Column:
    """First-matching-format standardizer: compact, then ts9, else NULL
    (typed NULL so downstream schema is DateType either way)."""
    return F.coalesce(compact_date(col), ts9_to_date(col), F.lit(None).cast("date"))
