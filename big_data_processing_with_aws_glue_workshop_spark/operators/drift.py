"""Distribution drift between corpus refreshes: Population Stability
Index over bucket histograms.

The operational question at a 100 TB crawl cadence is not "is the new
wave clean" (the DQ validators answer that row-by-row) but "does the new
wave LOOK like the standing corpus" — a length distribution that
suddenly shifts, a language mix that collapses, a value histogram that
grows a spike, all signal an upstream change worth stopping the pipeline
for. The standard industry statistic is PSI:

    PSI = Σ_buckets (q_b - p_b) * ln(q_b / p_b)

with p = baseline share, q = candidate share per bucket. Conventional
reading (public credit-scoring practice): < 0.10 stable, 0.10-0.25
moderate shift, > 0.25 significant drift.

This composes directly with the incremental machinery: the baseline is
the maintained histogram state (``incremental_agg_refresh`` with
``log2_bucket`` in the group keys — see plans/incremental.py), the
candidate is the increment's histogram, so the drift check costs one
broadcast-small join over bucket counts — no corpus re-read, runnable on
every refresh.

Zero-count buckets are smoothed with ``epsilon`` share (a bucket present
on only one side would otherwise send ln to ±inf); the smoothing is part
of the contract and the test's reference computes the identical formula.

Bucket-granularity caveat (measured, sf0.01 events): PSI needs adequate
counts PER BUCKET or sampling noise reads as drift — at 8 buckets/octave
(~90 buckets, ~22 rows each) a random half-vs-half split of the SAME
population scored 0.23-0.41, above the 0.25 line, pure noise; at 1
bucket/octave the same split scores <= 0.067 (stable) while a genuine
4x value shift scores >= 1.96. Rule of thumb from the public PSI
literature: >= ~100 samples per bucket before the thresholds mean
anything; prefer coarse buckets for drift (and keep the fine-grained
histogram for percentile readout — both derive from the same counts).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def psi_drift(
    baseline: DataFrame,
    candidate: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str = "bucket",
    count_col: str = "n",
    epsilon: float = 1e-6,
) -> DataFrame:
    """Per-key PSI between two bucket histograms (rows: keys + bucket +
    count). Returns ``keys + psi + n_buckets`` — one row per key present
    in EITHER histogram; a key entirely missing from one side yields its
    maximal-drift PSI rather than being dropped (full outer joins all
    the way down)."""
    keys = list(key_cols)

    def shares(df, share_name):
        tot = df.groupBy(*keys).agg(F.sum(count_col).alias("__tot"))
        return (
            df.join(tot, keys)
            .select(
                *keys,
                F.col(bucket_col),
                (F.col(count_col) / F.col("__tot")).alias(share_name),
            )
        )

    p = shares(baseline, "p")
    q = shares(candidate, "q")
    joined = p.join(q, keys + [bucket_col], "full_outer").select(
        *keys,
        F.coalesce("p", F.lit(0.0)).alias("p"),
        F.coalesce("q", F.lit(0.0)).alias("q"),
    )
    pe = F.greatest("p", F.lit(epsilon))
    qe = F.greatest("q", F.lit(epsilon))
    return (
        joined.withColumn("__term", (qe - pe) * F.log(qe / pe))
        .groupBy(*keys)
        .agg(
            F.sum("__term").alias("psi"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )
