"""Snapshot diff (CDC reconciliation) between two keyed table versions.

The reference's medallion layers are rebuilt wholesale each run
(/root/reference/src/silver/job-silver-rues.py writes the full lake every
job); a production lake needs the complementary audit: given yesterday's
snapshot and today's, which keys were added, removed, changed (and in
which columns), or untouched. This is the reconciliation step behind
incremental refresh validation (plans/incremental.py) and the input to
slowly-changing-dimension maintenance (operators/merge.py).

Scale posture: ONE full-outer sort-merge join on the snapshot key — the
minimum possible data movement for an exact diff (every row of both
snapshots must meet its counterpart). With both snapshots written
bucketed on the key (sources/catalog.py) the Exchange disappears
entirely and the diff is a zero-shuffle zip of co-located buckets. The
change-detection projection is pure Catalyst column expressions
(null-safe equality per compared column), so whole-stage codegen keeps
it scan-speed; nothing is collected to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exact keyed diff of two snapshots.

    Returns one row per key present in either snapshot with:

    - the key columns (coalesced across sides),
    - ``change_type``: 'added' (key only in ``new``), 'removed' (only in
      ``old``), 'changed' (present in both, at least one compared column
      differs), 'unchanged',
    - ``changed_cols``: comma-joined names of differing columns in the
      caller's ``compare_cols`` order; NULL unless ``change_type`` is
      'changed',
    - ``old_<c>`` / ``new_<c>`` for every compared column (the evidence).

    Comparison is null-safe (NULL vs NULL is equal, NULL vs value is a
    change), matching SQL ``IS DISTINCT FROM``. Keys must be unique per
    snapshot — this is a version diff, not a bag diff.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    compare_cols = list(compare_cols)

    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("_in_new", F.lit(True))

    j = o.join(n, on=keys, how="full_outer")
    in_old = F.coalesce(F.col("_in_old"), F.lit(False))
    in_new = F.coalesce(F.col("_in_new"), F.lit(False))
    # concat_ws drops NULL args, so this is the ordered list of names whose
    # old/new values are DISTINCT; '' means no compared column differs
    changed_list = F.concat_ws(
        ",",
        *[
            F.when(
                ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")), F.lit(c)
            )
            for c in compare_cols
        ],
    )
    change_type = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(changed_list != F.lit(""), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        change_type.alias("change_type"),
        F.when(change_type == "changed", changed_list).alias("changed_cols"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
