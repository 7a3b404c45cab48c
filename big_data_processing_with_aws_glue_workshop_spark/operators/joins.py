"""Join operators: dim enrichment and referential-integrity checks."""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    df: DataFrame,
    dim: DataFrame,
    on: str | Column,
    select_map: Mapping[str, str],
    how: str = "left",
    broadcast: bool = True,
    drop_join_col: str | None = None,
) -> DataFrame:
    """Left-join a small dimension onto a fact, projecting/renaming only the
    needed dim columns (J1/J2; reference src/silver/job-silver-rues.py:220-292).

    ``select_map`` maps dim column -> output alias. ``broadcast=True`` pins a
    broadcast-hash join so the plan never degrades to a shuffled join at
    scale when the optimizer mis-estimates the dim size.
    """
    projected = dim.select(
        *[F.col(src).alias(dst) for src, dst in select_map.items()],
        *([on] if isinstance(on, str) and on not in select_map.values() else []),
    )
    right = F.broadcast(projected) if broadcast else projected
    out = df.join(right, on=on, how=how)
    if drop_join_col:
        out = out.drop(drop_join_col)
    return out


def anti_join_orphans(fact: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Fact keys missing from the dimension (J3/D3; reference
    src/gold/job-gold-rues.py:211-231). Distinct projections first so the
    anti join shuffles keys, not full rows."""
    fact_keys = fact.select(key).distinct()
    dim_keys = dim.select(key).distinct()
    return fact_keys.join(dim_keys, on=key, how="left_anti")
