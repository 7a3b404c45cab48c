"""Sinks.

Scale posture: partitioned writes hash-repartition on the partition column
first so each Hive partition is written by a bounded number of tasks (avoids
the many-small-files explosion of one-file-per-task-per-partition); file
counts are explicit knobs, matching the reference's manual sizing
(reference src/bronze/job-bronze-rues.py:135-152, src/gold/job-gold-rues.py:159-199).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    num_files: int = 30,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned snappy parquet sink (operator S5)."""
    (
        df.repartition(num_files, partition_col)
        .write.mode(mode)
        .partitionBy(partition_col)
        .option("compression", "snappy")
        .parquet(path)
    )


def write_parquet(
    df: DataFrame, path: str, num_files: int = 20, mode: str = "overwrite"
) -> None:
    """Unpartitioned snappy parquet sink (operator S6)."""
    df.repartition(num_files).write.mode(mode).option("compression", "snappy").parquet(
        path
    )


def write_csv_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-file CSV sink for tiny outputs like error logs (operator S7;
    reference src/silver/job-silver-rues.py:452-457). coalesce(1) is only
    safe for driver-scale data — keep it off any large path."""
    df.coalesce(1).write.mode(mode).option("header", "true").csv(path)

