"""Honest measurement: does the manual split+salt join beat Spark's own
AQE skew-join handling, and when?

Setup: left fact with a single hot key holding ``HOT_SHARE`` of all
rows; right side too large to auto-broadcast. Three timed variants of
the same inner join, result counts asserted equal:

1. plain join, AQE ON (the repo's default session) — AQE's
   skewedJoin splits oversized SMJ partitions at runtime;
2. plain join, AQE skew-split OFF — what a stream-static or
   non-SMJ plan experiences (the serialized-hot-partition regime);
3. skew_resilient_join (operators/skew.py), AQE ON.

Usage: python tools/skew_probe.py [left_millions] [hot_share]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.skew import (
    skew_resilient_join,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session


def main() -> None:
    n_left = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    spark = get_session(app_name="skew-probe")

    n_keys = 2_000_000
    left = (
        spark.range(n_left)
        .select(
            F.when(F.pmod(F.xxhash64("id"), F.lit(1000)) < int(hot_share * 1000), 0)
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_keys)) + 1)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        .persist()
    )
    right = (
        spark.range(n_keys + 1)
        .select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("d1"),
            F.sha2(F.col("id").cast("string"), 256).alias("d2"),
        )
        .persist()
    )
    left.count(), right.count()
    hot = spark.createDataFrame([(0,)], "k long")
    # warm-up: compile both plan shapes once before timing
    left.limit(100_000).join(right, "k").count()
    skew_resilient_join(
        left.limit(100_000), right, ["k"], n_salts=32, heavy_keys=hot
    ).count()

    def timed(label, fn):
        t0 = time.time()
        n = fn()
        print(f"{label}: {time.time() - t0:.2f} s ({n:,} rows)", flush=True)
        return n

    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join

    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    a = timed("plain join, AQE skew ON ", lambda: left.join(right, "k").count())
    b = timed(
        "salted join,  AQE skew ON ",
        lambda: skew_resilient_join(
            left, right, ["k"], n_salts=32, heavy_keys=hot
        ).count(),
    )
    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    c = timed("plain join, AQE skew OFF", lambda: left.join(right, "k").count())
    d = timed(
        "salted join,  AQE skew OFF",
        lambda: skew_resilient_join(
            left, right, ["k"], n_salts=32, heavy_keys=hot
        ).count(),
    )
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert a == b == c == d


if __name__ == "__main__":
    main()
