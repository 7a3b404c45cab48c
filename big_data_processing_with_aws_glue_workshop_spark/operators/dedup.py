"""Deduplication operators.

Scale notes: keep-latest is a single hash shuffle on the partition keys.
At 100 TB the (key) distribution decides everything — AQE skew handling is
on in the session factory, and `salt_partitions` below offers explicit
two-phase salting when one key dominates (e.g. NULL nit in the RUES data).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str | Column,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep the most-recent row per key (RN-002; reference
    src/silver/job-silver-rues.py:204-214): row_number over
    (keys, order desc NULLS LAST) and keep rank 1.

    ``tiebreak_cols`` pins a deterministic winner when order values tie —
    the reference leaves ties arbitrary (SURVEY §7.4 flags this); callers
    that need reproducibility pass a unique column.
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    ordering = [order.desc_nulls_last()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*partition_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_count(df: DataFrame, subset: Sequence[str] | None = None) -> int:
    """Number of exact duplicate rows (bronze profiling A4; reference
    src/bronze/job-bronze-rues.py:109-118). One aggregation instead of the
    reference's count() + dropDuplicates().count() double pass."""
    cols = list(subset) if subset else df.columns
    counted = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
    row = counted.agg(
        F.sum(F.col("__n") - 1).alias("dups"),
    ).collect()[0]
    return int(row["dups"] or 0)


def salt_partitions(
    df: DataFrame, partition_cols: Sequence[str], buckets: int = 16
) -> DataFrame:
    """Add a salt column for two-phase aggregation over skewed keys: first
    aggregate on (keys, salt), then on keys. Spark-side `pmod(hash(...))`
    keeps the salt deterministic."""
    return df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in partition_cols]), F.lit(buckets))
    )
