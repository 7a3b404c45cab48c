"""Managed-table catalog layer: the open-source stand-in for the reference's
Glue Data Catalog (reference src/gold/job-gold-rues.py:61-78 reads silver
through the catalog; here tables live in the Spark warehouse).

Bucketing is the 100-TB join strategy this enables: two tables bucketed by
the same key into the same bucket count join WITHOUT a shuffle — the
exchange disappears from the plan (asserted in tests/test_bucketing.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed parquet table.
    Sorting within buckets additionally removes the Sort from later
    sort-merge joins on the bucket key."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def save_table(df: DataFrame, table_name: str, mode: str = "overwrite") -> None:
    """Plain managed table (operator S4 stand-in: downstream layers read via
    spark.table instead of paths)."""
    df.write.mode(mode).format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
