"""Hierarchical time rollup (hypertable/continuous-aggregate style).

``time_rollup_chain`` materializes aggregates at increasing granularities
where each level is computed FROM THE PREVIOUS LEVEL, not from raw data:
minute -> hour -> day re-aggregates (sum of sums, sum of counts, max of
maxes). At 100 TB this is the difference between one raw scan per level
and one raw scan total — the finer level is both the serving table for
fine-grained queries and the input for the coarser ones.

Only decomposable aggregates (sum/count/min/max, and mean as sum+count)
chain this way; the module keeps the aggregate set fixed accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import floor_time_bucket


def _bucket(col, seconds: int):
    return F.timestamp_seconds(floor_time_bucket(col, seconds) * F.lit(seconds))


def aggregate_level(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int,
    key_cols: list[str],
    from_rollup: bool = False,
) -> DataFrame:
    """One granularity level. ``from_rollup=False`` aggregates raw rows
    (value column); ``from_rollup=True`` re-aggregates a finer level's
    partials (sum of n/total, max of max)."""
    bucket = _bucket(F.col(ts_col), bucket_seconds).alias("bucket_ts")
    if not from_rollup:
        return df.groupBy(bucket, *key_cols).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
            F.max("value").alias("max_value"),
        )
    return df.groupBy(bucket, *key_cols).agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.max("max_value").alias("max_value"),
    )


def time_rollup_chain(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    levels_seconds: tuple[int, ...] = (60, 3600, 86400),
) -> dict[int, DataFrame]:
    """Chained rollups: {bucket_seconds: aggregate_df}. Level i is computed
    from level i-1 (raw only for the first). Coarser levels must be integer
    multiples of the finer ones."""
    for fine, coarse in zip(levels_seconds, levels_seconds[1:]):
        if coarse % fine != 0:
            raise ValueError(f"level {coarse}s is not a multiple of {fine}s")
    key_cols = key_cols or []
    out: dict[int, DataFrame] = {}
    prev: DataFrame | None = None
    for secs in levels_seconds:
        if prev is None:
            level = aggregate_level(df, ts_col, secs, key_cols, from_rollup=False)
        else:
            level = aggregate_level(prev, "bucket_ts", secs, key_cols, from_rollup=True)
        out[secs] = level
        prev = level
    return out
