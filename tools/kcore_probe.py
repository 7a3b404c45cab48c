"""Peeling-depth probe for operators/graph.py::k_core on the real sf0.1
co-purchase graph: rounds to converge, surviving core size, and wall per
k. The claim under test is the loop's scale shape — one job per round,
rounds = peeling depth (typically small even when the cascade is long) —
measured on the scored queries' exact input, not a synthetic toy.

Usage: python tools/kcore_probe.py [k...]   (default 8 32 64 96 128)
Writes one markdown table row per k to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
    copurchase_adjacency,
    k_core,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [8, 32, 64, 96, 128]
    spark = get_session(app_name="kcore-probe")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    adj = copurchase_adjacency(li).persist()
    n = adj.count()
    print(f"graph: {n:,} vertices ({SF_DIR})")
    print("| k | core vertices | min core degree | wall (s) |")
    print("|---|---|---|---|")
    for k in ks:
        t0 = time.time()
        core = k_core(adj, k, max_iter=100)
        rows = core.agg({"core_degree": "min", "node": "count"}).collect()[0]
        wall = time.time() - t0
        n_core = rows["count(node)"]
        min_deg = rows["min(core_degree)"]
        print(f"| {k} | {n_core:,} | {min_deg} | {wall:.2f} |", flush=True)
    adj.unpersist()


if __name__ == "__main__":
    main()
