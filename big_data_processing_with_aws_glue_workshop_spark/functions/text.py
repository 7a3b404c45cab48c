"""Text/identifier expressions (RN-003/006/010 families)."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_snake_case(name: str) -> str:
    """Canonical snake_case for a column name (RN-010; reference
    src/silver/job-silver-rues.py:119-124): split camelCase boundaries,
    collapse whitespace/dash/dot runs to '_', lowercase."""
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    s = re.sub(r"[\s\-\.]+", "_", s)
    return s.lower()


def snake_case_columns(df: DataFrame) -> DataFrame:
    """Rename every column to snake_case in ONE projection (the reference
    loops withColumnRenamed, which stacks a plan node per column; a single
    select keeps the logical plan flat for wide tables)."""
    return df.select(
        [F.col(f"`{c}`").alias(to_snake_case(c)) for c in df.columns]
    )


def normalize_upper_trim(col: Column) -> Column:
    """UPPER(TRIM(x)) categorical normalizer (RN-003/RN-008;
    reference src/silver/job-silver-rues.py:190-193,225-233)."""
    return F.upper(F.trim(col))


def surrogate_key(*cols: Column | str, sep: str = "_") -> Column:
    """concat_ws surrogate key (RN-006 id_unico; reference
    src/silver/job-silver-rues.py:334-340). concat_ws skips NULLs — a NULL
    component shortens the key instead of nulling it, matching the reference."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])
