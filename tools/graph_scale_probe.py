"""Graph-size scaling probe for operators/graph.py: wall time of
pagerank_integer (3 rounds) and triangle_census as the graph grows.

The sf0.1 co-purchase graph is replicated into r DISJOINT copies by
offsetting vertex ids (offset >> max id), which scales nodes and edges
exactly r× while keeping per-copy structure identical. That buys two
things: a clean wall-vs-size curve (the "would this survive 100×?"
evidence for docs/SCALE.md), and an EXACT invariant that doubles as a
correctness check at every size — disjoint copies can't create or
destroy triangles, so n_triangles(r) must equal r · n_triangles(1)
(the probe raises if it doesn't).

Usage: python tools/graph_scale_probe.py [replicas...]   (default 1 4 16)
Writes one markdown table row per size to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
    copurchase_adjacency,
    pagerank_integer,
    triangle_census,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10**7  # >> max part id: replicas are disjoint by construction


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session(app_name="graph-scale-probe")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    base = copurchase_adjacency(li).persist()
    base.count()
    tri_1 = None
    print("| replicas | nodes | edges | pagerank x3 (s) | census (s) | triangles |")
    print("|---|---|---|---|---|---|")
    for r in sizes:
        adj = base
        if r > 1:
            copies = [
                base.select(
                    (F.col("src") + F.lit(i * OFFSET)).alias("src"),
                    F.transform("dsts", lambda d: d + F.lit(i * OFFSET)).alias(
                        "dsts"
                    ),
                )
                for i in range(r)
            ]
            adj = copies[0]
            for c in copies[1:]:
                adj = adj.unionByName(c)
        adj = adj.persist()
        n_nodes = adj.count()
        n_edges = adj.selectExpr("sum(size(dsts))").collect()[0][0] // 2

        t0 = time.time()
        pagerank_integer(adj, n_iter=3).selectExpr("sum(pr)").collect()
        t_pr = time.time() - t0

        t0 = time.time()
        row = triangle_census(adj).collect()[0]
        t_tc = time.time() - t0

        if r == 1:
            tri_1 = row["n_triangles"]
        elif row["n_triangles"] != r * tri_1:
            raise AssertionError(
                f"invariant broken: triangles({r}x) = {row['n_triangles']}"
                f" != {r} * {tri_1}"
            )
        print(
            f"| {r}x | {n_nodes:,} | {n_edges:,} | {t_pr:.2f} | {t_tc:.2f} "
            f"| {row['n_triangles']:,} |",
            flush=True,
        )
        if r > 1:
            adj.unpersist()
    base.unpersist()


if __name__ == "__main__":
    main()
