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


def write_parquet_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 512,
    sample_rows: int = 20_000,
    mode: str = "overwrite",
) -> dict:
    """Parquet sink that SIZES its file count from measured bytes instead
    of a guessed ``num_files``: writes a ``sample_rows`` sample through
    the real parquet+snappy path, measures bytes/row, and repartitions to
    ceil(total_bytes / target). The manual knob fails quietly in both
    directions at scale — too few files starves read parallelism, too
    many recreates the small-file problem compaction exists to fix; a
    measured estimate tracks the table's actual compression (column
    types, dictionary hit rate) rather than a rule of thumb.

    Cost: one count + one sample write (bounded by ``sample_rows``).
    The sample rides the same codecs, so skew in compressibility across
    the table is the remaining error source — at the real scale, feed a
    larger sample or reuse a prior refresh's measured ratio. Returns
    {"n_files", "total_rows", "bytes_per_row"}.
    """
    import math
    import os
    import shutil
    import tempfile

    total_rows = df.count()
    if total_rows == 0:
        df.coalesce(1).write.mode(mode).option("compression", "snappy").parquet(path)
        return {"n_files": 1, "total_rows": 0, "bytes_per_row": 0.0}

    sample_dir = tempfile.mkdtemp(prefix="sized_sample_")
    try:
        n_sample = min(sample_rows, total_rows)
        df.limit(n_sample).coalesce(1).write.mode("overwrite").option(
            "compression", "snappy"
        ).parquet(sample_dir)
        sample_bytes = sum(
            os.path.getsize(os.path.join(sample_dir, f))
            for f in os.listdir(sample_dir)
            if f.endswith(".parquet")
        )
        bytes_per_row = sample_bytes / n_sample
    finally:
        shutil.rmtree(sample_dir, ignore_errors=True)

    n_files = max(1, math.ceil(total_rows * bytes_per_row / (target_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode(mode).option(
        "compression", "snappy"
    ).parquet(path)
    return {
        "n_files": n_files,
        "total_rows": total_rows,
        "bytes_per_row": round(bytes_per_row, 2),
    }
