#!/usr/bin/env python
"""Scale-stress smoke: inflate the sf0.1 tables N-fold in-plan (explode a
replica index — no disk writes) and run the shuffle-heavy operator families.
Validates that plans scale linearly-ish before they meet a real cluster;
not part of the default test suite.

Usage: python stress.py [replication_factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.session import get_session


def inflate(df, factor: int, key_cols: list[str]):
    """Replicate rows factor-x, perturbing keys so group/join cardinality
    scales too (replica i shifts keys by i * 10^9)."""
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    out = df.select("*", replicas)
    for k in key_cols:
        out = out.withColumn(k, F.col(k) + F.col("__rep") * F.lit(1_000_000_000))
    return out.drop("__rep")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="stress")

    lineitem = inflate(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), factor, ["l_orderkey"]
    )
    orders = inflate(
        spark.read.parquet(f"{sf_dir}/orders.parquet"), factor, ["o_orderkey", "o_custkey"]
    )

    n_li = lineitem.count()
    results: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        results[name] = round(time.perf_counter() - t0, 2)

    # partial-agg heavy: group on low-cardinality keys
    timed(
        "groupby_agg",
        lambda: lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.count(F.lit(1)))
        .count(),
    )
    # wide shuffle: high-cardinality window dedup
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc())
    timed(
        "window_dedup",
        lambda: orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .count(),
    )
    # fact-fact join on the inflated key
    timed(
        "big_join",
        lambda: lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count(),
    )
    # distinct on high-cardinality composite
    timed(
        "count_distinct",
        lambda: lineitem.select("l_orderkey", "l_linenumber").distinct().count(),
    )

    print(
        json.dumps(
            {
                "rows_lineitem": n_li,
                "replication": factor,
                "timings_sec": results,
                "rows_per_sec_join": round(n_li / results["big_join"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
