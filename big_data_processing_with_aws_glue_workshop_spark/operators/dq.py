"""Data-quality operators: the reference's distinctive surface (§2.11).

The design keeps the reference's key optimization — EVERY validation rule is
one conditional count inside a SINGLE aggregation pass (reference
src/silver/job-silver-rues.py:352-391, labeled 'OPTIMIZADO') — but turns the
driver-side global error list into data: a rules list in, a summary row and
an error-log DataFrame out. Records are never dropped, only reported
(RN-007 contract).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# RN-007 error-log schema (reference src/silver/job-silver-rues.py:107-113)
error_log_schema = T.StructType(
    [
        T.StructField("columna", T.StringType(), False),
        T.StructField("mensaje_error", T.StringType(), False),
        T.StructField("valor", T.StringType(), False),
    ]
)


@dataclass(frozen=True)
class ValidationRule:
    """One DQ rule: count rows where ``predicate`` holds; if any, report an
    error-log record attributed to ``column`` with ``message``."""

    name: str
    column: str
    message: str
    predicate: Column


def consolidated_validation(
    df: DataFrame, rules: list[ValidationRule]
) -> tuple[dict[str, int], DataFrame]:
    """Run every rule in ONE scan. Returns ({rule_name: violation_count},
    error_log_df). Partial aggregation makes the shuffle one row per rule
    regardless of table size."""
    agg_row = df.agg(
        *[F.count(F.when(r.predicate, 1)).alias(r.name) for r in rules]
    ).collect()[0]
    counts = {r.name: int(agg_row[r.name]) for r in rules}

    spark = df.sparkSession
    errors = [
        (r.column, r.message, f"{counts[r.name]} registros")
        for r in rules
        if counts[r.name] > 0
    ]
    error_df = spark.createDataFrame(errors, error_log_schema)
    return counts, error_df


def null_profile(df: DataFrame, columns: list[str] | None = None) -> dict[str, int]:
    """Per-column NULL counts in one pass (A3; reference
    src/bronze/job-bronze-rues.py:92-95)."""
    cols = columns or df.columns
    row = df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols]
    ).collect()[0]
    return {c: int(row[c]) for c in cols}


def sampled_profile(
    df: DataFrame, fraction: float = 0.01, seed: int = 42
) -> tuple[int, dict[str, int], int]:
    """Bronze DQ profile on a Bernoulli sample (D4; reference
    src/bronze/job-bronze-rues.py:79-120): (sample_rows, null_counts,
    duplicate_rows). The sample is cached for its three passes then freed."""
    sample = df.sample(withReplacement=False, fraction=fraction, seed=seed)
    sample.cache()
    try:
        n = sample.count()
        nulls = null_profile(sample)
        from .dedup import exact_dedup_count

        dups = exact_dedup_count(sample)
    finally:
        sample.unpersist()
    return n, nulls, dups
