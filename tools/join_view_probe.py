"""Measure incremental join-view maintenance against the full re-join
it replaces: land W fact waves (plus a late dim wave), and time each
refresh vs a from-scratch join of everything landed so far.

The claim under test (plans/incremental.py::incremental_join_refresh):
per-refresh cost is O(increment + pending + dim), FLAT in the number of
waves, while the naive rebuild grows linearly with the landed corpus —
and a late-arriving dim drains pending without re-reading any fact.

Usage: python tools/join_view_probe.py [n_waves rows_per_wave dim_rows]
Prints one JSON line per wave; paste into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
    incremental_join_refresh,
    read_join_view,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session
from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import JobBookmark


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    n_waves, per_wave, dim_rows = (args + [8, 2_000_000, 200_000])[:3]
    spark = get_session(app_name="join-view-probe")
    root = tempfile.mkdtemp(prefix="jvprobe_")
    facts, dims = os.path.join(root, "facts"), os.path.join(root, "dims")
    os.makedirs(facts)
    os.makedirs(dims)
    target = os.path.join(root, "view")
    fbm = JobBookmark(os.path.join(root, "bm.json"), "facts")
    dbm = JobBookmark(os.path.join(root, "bm.json"), "dims")
    pat_f, pat_d = os.path.join(facts, "*", "*.parquet"), os.path.join(
        dims, "*", "*.parquet"
    )

    # dims: keys [0, dim_rows); half arrive up front, half arrive late
    # (wave n_waves//2) so a real pending drain is measured
    spark.range(dim_rows // 2).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("attr")
    ).write.parquet(os.path.join(dims, "d0"))

    try:
        for w in range(n_waves):
            # facts reference keys across the FULL dim domain, so ~half of
            # each early wave is pending until the late dim wave lands
            spark.range(w * per_wave, (w + 1) * per_wave).select(
                F.pmod(F.xxhash64("id"), F.lit(dim_rows * 11 // 10)).alias("k"),
                F.col("id").alias("x"),
            ).write.parquet(os.path.join(facts, f"f{w}"))
            if w == n_waves // 2:
                spark.range(dim_rows // 2, dim_rows).select(
                    F.col("id").alias("k"),
                    F.md5(F.col("id").cast("string")).alias("attr"),
                ).write.parquet(os.path.join(dims, "d1"))

            t0 = time.time()
            stats = incremental_join_refresh(
                spark, fbm, pat_f, dbm, pat_d, target, "k"
            )
            t_incr = time.time() - t0

            # the honest rebuild: re-join EVERYTHING and REWRITE the
            # whole view (what a non-incremental pipeline actually runs
            # per refresh — counting the join would hide the O(corpus)
            # write that dominates at scale)
            t0 = time.time()
            spark.read.parquet(os.path.join(facts, "*")).join(
                spark.read.parquet(os.path.join(dims, "*")), "k", "inner"
            ).write.mode("overwrite").parquet(os.path.join(root, "rebuilt"))
            t_full = time.time() - t0
            full = spark.read.parquet(os.path.join(root, "rebuilt")).count()
            view_rows = read_join_view(spark, target).count()
            assert view_rows == full, (view_rows, full)
            print(
                json.dumps(
                    {
                        "wave": w,
                        "landed_rows": (w + 1) * per_wave,
                        "incr_sec": round(t_incr, 2),
                        "full_rebuild_sec": round(t_full, 2),
                        "rows_written_incr": stats["matched_new"]
                        + stats["pending_rows"],
                        "rows_written_full": full,
                        "pending_rows": stats["pending_rows"],
                        "view_rows": view_rows,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
