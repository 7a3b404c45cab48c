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


def _null_safe_key_cond(left: DataFrame, right: DataFrame, keys: Sequence[str]):
    """NULL-safe key equality: a NULL key must match a NULL key, otherwise
    replace-by-key semantics silently keep both versions of NULL-keyed rows."""
    cond = left[keys[0]].eqNullSafe(right[keys[0]])
    for k in keys[1:]:
        cond = cond & left[k].eqNullSafe(right[k])
    return cond


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """SCD1 upsert: target rows whose key appears in source are replaced by
    the source rows; unmatched target rows survive; new keys insert."""
    keys = list(keys)
    src_keys = source.select(*keys).distinct()
    kept = target.join(
        src_keys, on=_null_safe_key_cond(target, src_keys, keys), how="left_anti"
    )
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

    # NULL is_current is treated as not-current history (a bare F.col /
    # ~F.col pair would route NULL-flag rows into NEITHER branch and lose
    # them); key joins are null-safe like upsert's
    is_current = F.coalesce(F.col(current_flag), F.lit(False))
    firsts = source.groupBy(*keys).agg(F.min(effective_col).alias("__eff"))
    current_rows = target.filter(is_current)
    closing = (
        current_rows.join(
            firsts, on=_null_safe_key_cond(current_rows, firsts, keys), how="inner"
        )
        .drop(*[firsts[k] for k in keys])
        .withColumn(valid_to, F.col("__eff"))
        .withColumn(current_flag, F.lit(False))
        .drop("__eff")
    )
    untouched = target.join(
        changed_keys, on=_null_safe_key_cond(target, changed_keys, keys), how="left_anti"
    )
    history_rows = target.filter(~is_current)
    closed_history = history_rows.join(
        changed_keys,
        on=_null_safe_key_cond(history_rows, changed_keys, keys),
        how="left_semi",
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
