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
    df: DataFrame, salt_cols: Sequence[str], buckets: int = 16
) -> DataFrame:
    """Add a deterministic salt column for two-phase aggregation over
    skewed keys: first aggregate on (keys, salt), then on keys.

    ``salt_cols`` must be columns that VARY WITHIN a hot group — a row id,
    the ordering column, any high-cardinality attribute — never the group
    keys themselves (hashing the keys maps every row of the hot key to ONE
    salt value, which splits nothing). Spark-side ``pmod(hash(...))`` keeps
    the salt deterministic so reruns partition identically."""
    return df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    )


def keep_latest_salted(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str | Column,
    tiebreak_cols: Sequence[str] = (),
    salt_cols: Sequence[str] | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe keep-latest: two-phase reduction for corpora where one key
    dominates (e.g. 90% NULL nit in RUES-shaped data).

    Phase 1 keeps the latest row per (keys, salt) — the hot key's rows are
    spread over ``buckets`` reducers instead of one — and phase 2 reduces
    the <= ``buckets`` survivors per key to the global winner. Equivalent to
    :func:`keep_latest` because latest-by-ordering is an associative,
    commutative reduction: the winner of per-bucket winners IS the global
    winner whenever the ordering is total (pass ``tiebreak_cols`` to make it
    total; with exact ties both paths pick an arbitrary tied row, same as
    the unsalted operator).

    ``salt_cols`` defaults to the ordering + tiebreak columns, which vary
    within any real hot key.

    WHEN TO USE (measured, docs/SCALE.md): on Spark >= 3.5 the PLAIN
    :func:`keep_latest` is already skew-immune — Catalyst rewrites the
    rank==1 filter into a map-side Partial WindowGroupLimit BEFORE the
    exchange, so each reducer receives at most num_map_partitions rows per
    key (20M rows / 90%-hot-key, local[32]: unsalted 1.35 s vs salted
    2.09 s — the salt only buys a second shuffle). Reach for this operator
    only when the window computation does NOT reduce to a group limit
    (full ordered payloads per key, percent_rank, engines without the
    rewrite rule); for rank-1 dedup prefer the unsalted path."""
    order_name = order_col if isinstance(order_col, str) else None
    if salt_cols is None:
        if order_name is None:
            raise ValueError("pass salt_cols explicitly when order_col is a Column")
        salt_cols = [order_name, *tiebreak_cols]
    salted = salt_partitions(df, salt_cols, buckets)
    phase1 = keep_latest(
        salted, [*partition_cols, "__salt"], order_col, tiebreak_cols
    ).drop("__salt")
    return keep_latest(phase1, partition_cols, order_col, tiebreak_cols)
