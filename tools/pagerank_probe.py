"""Iteration-depth probe for operators/graph.py::pagerank_integer.

Each PageRank round adds one join+agg to the lineage, so wall time per
round should be flat ONLY if the plan is kept shallow — this probe
measures total wall at growing n_iter on the real sf0.1 co-purchase
graph (cached adjacency, the scored query's exact input) twice: with
lineage truncation (checkpoint_every=8, the operator default) and
without (checkpoint_every=10^9), so the docs/SCALE.md guidance on WHERE
plan growth starts to bite is measured, not asserted.

Usage: python tools/pagerank_probe.py [iters...]   (default 1 3 6 12 24)
Writes one markdown table row per depth to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
    copurchase_adjacency,
    pagerank_integer,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    iters = [int(a) for a in sys.argv[1:]] or [1, 3, 6, 12, 24]
    spark = get_session(app_name="pagerank-probe")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    adj = copurchase_adjacency(li).persist()
    n_nodes = adj.count()
    n_edges = adj.selectExpr("sum(size(dsts))").collect()[0][0]
    print(f"graph: {n_nodes:,} nodes, {n_edges:,} edges ({SF_DIR})")
    print("| n_iter | wall ckpt@8 (s) | wall no-ckpt (s) | mass kept |")
    print("|---|---|---|---|")
    scale = 10**12
    for n in iters:
        t0 = time.time()
        kept = (
            pagerank_integer(adj, n_iter=n, checkpoint_every=8)
            .selectExpr("sum(pr)")
            .collect()[0][0]
        )
        t_ck = time.time() - t0
        t0 = time.time()
        pagerank_integer(adj, n_iter=n, checkpoint_every=10**9).selectExpr(
            "sum(pr)"
        ).collect()
        t_no = time.time() - t0
        print(
            f"| {n} | {t_ck:.2f} | {t_no:.2f} | {kept / scale:.6f} |",
            flush=True,
        )
    adj.unpersist()


if __name__ == "__main__":
    main()
