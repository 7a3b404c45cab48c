"""MERGE / upsert emulation over plain parquet (no Delta/Iceberg jars in
this environment — SURVEY §7.3 notes table formats as the production path;
these operators provide the semantics with anti-join + union + window).

``upsert``: SCD1 — source rows replace matching target rows by key.
``scd2_apply``: SCD2 — matching target rows are closed (valid_to set),
source rows open new current versions; history is preserved.
Both are single-shuffle-per-side plans (anti join + union)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """SCD1 upsert: target rows whose key appears in source are replaced by
    the source rows; unmatched target rows survive; new keys insert."""
    keys = list(keys)
    kept = target.join(source.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(source)


def scd2_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """SCD2 merge. ``target`` carries (valid_from, valid_to, is_current)
    bookkeeping columns; ``source`` carries the business columns plus
    ``effective_col`` (the change timestamp). Matching current rows close at
    the source row's effective time; source rows open as current versions."""
    keys = list(keys)
    changed_keys = source.select(*keys).distinct()

    closing = (
        target.filter(F.col(current_flag))
        .join(
            source.groupBy(*keys).agg(F.min(effective_col).alias("__eff")),
            on=keys,
            how="inner",
        )
        .withColumn(valid_to, F.col("__eff"))
        .withColumn(current_flag, F.lit(False))
        .drop("__eff")
    )
    untouched = target.join(changed_keys, on=keys, how="left_anti")
    closed_history = target.filter(~F.col(current_flag)).join(
        changed_keys, on=keys, how="left_semi"
    )

    # multiple source versions of one key must CHAIN: each version closes at
    # the next version's effective time; only the latest stays current
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(effective_col))
    opening = (
        source.withColumn(valid_from, F.col(effective_col))
        .withColumn(
            valid_to,
            F.lead(effective_col).over(w).cast(target.schema[valid_to].dataType),
        )
        .withColumn(current_flag, F.lead(effective_col).over(w).isNull())
        .drop(effective_col)
    )
    return (
        untouched.unionByName(closed_history)
        .unionByName(closing)
        .unionByName(opening, allowMissingColumns=False)
    )
