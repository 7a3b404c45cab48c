"""Count-Min sketch: bounded-size frequency state for ultra-wide key
domains (Cormode & Muthukrishnan 2005).

Why this exists next to exact groupBy counts: at 100 TB the key domain
of URLs / shingles / n-grams can be billions-wide — an exact count
table IS the corpus-scale object, and maintaining it incrementally
means an O(distinct keys) state rewrite per refresh. A CMS caps the
state at ``depth x width`` counters REGARDLESS of domain size, never
underestimates, and overestimates by at most eps*N (eps = e/width)
with probability 1 - (1/e)^depth per query — the right tool for
"which shingles/URLs are hot" when the long tail doesn't matter.

Spark shape (everything JVM-side, no UDFs):

- ``cms_sketch``: per input row, compute ``depth`` bucket indexes with
  seeded xxhash64 and explode to (row, bucket) pairs; one groupBy sums
  them. The output is a DataFrame of at most depth*width rows — a
  COUNT MONOID keyed by (row, bucket), so it merges with plain
  ``union + groupBy sum`` (``cms_merge``) and, critically, rides
  ``plans/incremental.incremental_agg_refresh`` unchanged: group keys
  = (row, bucket), agg = count — bounded-size incremental frequency
  state with the existing crash-replay discipline (pinned by
  tests/test_sketch.py).
- ``cms_estimate``: recompute the same buckets for the queried keys,
  left-join the sketch (missing bucket = 0), take the per-key MIN over
  depth rows. Estimates are deterministic given (seed, depth, width) —
  xxhash64 is the same function everywhere — so tests pin exact
  values, not distributions.
- ``cms_heavy_hitters``: filter a candidate key set by estimate >=
  threshold. CMS never underestimates, so recall over the candidates
  is 1.0 by construction; false positives are bounded by eps*N.
  (Candidate generation is the caller's job — e.g. the increment's own
  distinct keys during a refresh, the standard streaming pattern.)

No reference-repo counterpart (beyond-reference family, like the HLL
``approx_distinct_profile``); the estimator is engine-deterministic
but not SQL-portable, so it ships pytest-pinned rather than
driver-oracled — same contract class as the ANN recall pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col, row: int, width: int, seed: int):
    # one independent hash row per sketch row: seed the hash with the row
    # index so rows disagree on collisions
    return F.pmod(F.xxhash64(F.lit(seed + row), key_col), F.lit(width))


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Build a Count-Min sketch of ``key_col`` occurrences: returns
    ``(row, bucket, n)`` with at most depth*width rows. NULL keys are
    excluded (count them separately if they matter)."""
    pairs = df.filter(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(key_col), r, width, seed).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return (
        pairs.select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketches over disjoint data unions are additive (the monoid):
    merge = union + groupBy sum. Only valid for sketches built with the
    same (depth, width, seed) — the caller owns that calibration, as
    with the near-dup signature state."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Point-estimate the count of every key in ``keys`` (one column, or
    a frame whose ``key_col`` is queried): returns ``(key_col, est)``
    with est = min over rows of the bucket counters. Never less than
    the true count."""
    k = keys.select(key_col).distinct().filter(F.col(key_col).isNotNull())
    probes = k.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(key_col), r, width, seed).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(sketch, ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Candidates whose estimated count reaches ``threshold`` —
    perfect recall over the candidate set (CMS never underestimates),
    precision bounded by the eps*N overestimate."""
    return cms_estimate(
        sketch, candidates, key_col, depth=depth, width=width, seed=seed
    ).filter(F.col("est") >= threshold)
