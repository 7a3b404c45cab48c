"""Payoff probe for incremental aggregate maintenance: refresh cost vs
full-rebuild cost as waves of files accumulate.

The claim in plans/incremental.py::incremental_agg_refresh is that a
refresh costs O(new files) + a keyed merge of two ALREADY-AGGREGATED
tables, while the naive alternative re-aggregates every row ever landed
— O(total). This probe lands identical-size waves, times both paths at
each step, and prints the curve.

Read the numbers honestly: on local[32] with a hot page cache the
rebuild is scan-bound at tens of millions of rows per second, so its
WALL line grows only gently — the measured asymmetry at this scale is
the flat refresh line vs the linearly-growing rebuild INPUT (wave N's
rebuild scans N x the refresh's bytes; that I/O ratio IS the wall ratio
once the fact exceeds cache, i.e. at the 100 TB target).

Each wave is `ROWS_PER_WAVE` synthetic fact rows over `N_KEYS` keys
(every wave touches every key, the worst case for the merge — the state
table is always fully rewritten, so the flat line is NOT an artifact of
sparse-key waves).

Usage: python tools/incr_agg_probe.py [n_waves]   (default 8)
Writes one markdown table row per wave to stdout.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
    incremental_agg_refresh,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session
from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
    JobBookmark,
)

ROWS_PER_WAVE = 2_000_000
N_KEYS = 50_000
AGGS = {
    "n_rows": ("count", "*"),
    "total": ("sum", "amount"),
    "hi": ("max", "amount"),
}


def main() -> None:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_session(app_name="incr-agg-probe")
    root = tempfile.mkdtemp(prefix="incr_agg_probe_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    target = os.path.join(root, "state")
    bm = JobBookmark(os.path.join(root, "bm.json"), "probe")
    pattern = os.path.join(landing, "*.parquet")

    print("| wave | rows landed | refresh (s) | full rebuild (s) | speedup |")
    print("|---|---|---|---|---|")
    try:
        for w in range(n_waves):
            wave = spark.range(ROWS_PER_WAVE).select(
                (F.col("id") % N_KEYS).alias("key"),
                ((F.col("id") * 7 + w) % 1000).alias("amount"),
            )
            wave.coalesce(4).write.mode("overwrite").parquet(
                os.path.join(landing, f"w{w}.parquet")
            )

            t0 = time.time()
            incremental_agg_refresh(spark, bm, pattern, ["key"], AGGS, target)
            t_incr = time.time() - t0

            t0 = time.time()
            full = (
                spark.read.parquet(pattern)
                .groupBy("key")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("amount").alias("total"),
                    F.max("amount").alias("hi"),
                )
            )
            full.write.mode("overwrite").parquet(os.path.join(root, "rebuild"))
            t_full = time.time() - t0

            total_rows = (w + 1) * ROWS_PER_WAVE
            print(
                f"| {w + 1} | {total_rows:,} | {t_incr:.2f} | {t_full:.2f} "
                f"| {t_full / t_incr:.2f}x |",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
