"""As-of (point-in-time) join — an operator Spark lacks natively.

Implementation strategy (composition of built-ins, per the preference order
in the build guidelines): tag-union both sides, sort within each key
partition by (time, side-tag), and carry the right side's latest value
forward with ``last_value(..., ignoreNulls)`` over an unbounded-preceding
window. ONE shuffle on the key — no per-key loops, no merge_asof in Python,
no range explosion — so the plan scales like any window aggregation.

Semantics: for each left row, the most recent right row of the same key
with ``right.time <= left.time`` (ties included, matching DuckDB/standard
ASOF JOIN '>=' semantics; at equal timestamps the right row sorts first via
the side tag).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, enriched with ``value_cols`` from the
    latest right row at-or-before its time (NULL when none exists)."""
    on = list(on)

    # the right row travels as ONE struct (non-null iff it is a right row),
    # so last(ignoreNulls) carries the latest right ROW — a legitimately
    # NULL value column inside it is preserved, not skipped past
    left_tagged = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast(
            T.StructType(
                [T.StructField(c, right.schema[c].dataType) for c in value_cols]
            )
        )
        .alias("__vals"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    right_tagged = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals"),
        F.lit(None).cast(left_tagged.schema["__row"].dataType).alias("__row"),
    )

    unioned = left_tagged.unionByName(right_tagged)
    # right rows (__side=0) sort before left rows at equal time -> '<=' match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__side",
        "__row",
        F.last(F.col("__vals"), ignorenulls=True).over(w).alias("__carried"),
    )
    out = carried.filter(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__carried.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
