"""Regular-grid resampling with gap fill — the time-series densification
step (dashboards, feature windows, rate computation) that raw event tables
need before any fixed-step model sees them: bucket events onto a fixed
step, materialize EVERY step between each key's first and last bucket,
and fill the gaps (zero for counts, forward-fill for gauges).

Scale shape: one hash aggregate on (key, bucket); the spine explode adds
one row per key per step in the key's span — bounded by time-range/step,
independent of event count — and the fill is one ordered window per key.
All exchanges hash on the key columns, so the agg, spine join, and fill
window reuse one partitioning (a single effective shuffle of the
aggregated frame, which is already far smaller than the input).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dates import floor_time_bucket

FILL_MODES = ("zero", "ffill", "null")


def resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    step_seconds: int,
    aggs: dict[str, Column],
    fill: dict[str, str],
) -> DataFrame:
    """Aggregate ``df`` per (key, fixed step bucket) with ``aggs``, densify
    each key's [first, last] bucket span, and fill gap rows per column:
    ``zero`` (additive counts/sums), ``ffill`` (last observation carried
    forward — gauges), or ``null`` (leave missing visible). Emits
    ``bucket_ts`` (timestamp) plus the key and aggregate columns."""
    for name, mode in fill.items():
        if mode not in FILL_MODES:
            raise ValueError(f"fill[{name!r}] must be one of {FILL_MODES}, got {mode!r}")
        if name not in aggs:
            raise ValueError(f"fill[{name!r}] names no aggregate (aggs: {sorted(aggs)})")

    bucket = floor_time_bucket(F.col(ts_col), step_seconds)
    bucketed = df.groupBy(
        *key_cols, bucket.alias("__bucket")
    ).agg(*[c.alias(n) for n, c in aggs.items()])

    spine = (
        bucketed.groupBy(*key_cols)
        .agg(F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__bucket"),
        )
    )
    dense = spine.join(bucketed, [*key_cols, "__bucket"], "left")

    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = dense
    for name, mode in fill.items():
        if mode == "zero":
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
        elif mode == "ffill":
            out = out.withColumn(name, F.last(name, ignorenulls=True).over(w))
    # every aggregate is emitted — fill only MODIFIES gap values; an agg
    # absent from ``fill`` keeps NULL gaps (the "null" mode by default)
    return out.select(
        *key_cols,
        F.timestamp_seconds(F.col("__bucket") * step_seconds).alias("bucket_ts"),
        *aggs.keys(),
    )
