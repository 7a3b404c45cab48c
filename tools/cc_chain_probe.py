"""Worst-case scaling probe for connected_components: planted deep chains.

Min-label propagation converges in rounds ~ graph diameter. Real near-dup
graphs are shallow (tiny cliques around a shared template: diameter 2-4),
so the scored queries converge in a handful of rounds — but a pathological
corpus (chained plagiarism: doc_i ~ doc_{i+1} for all i) degenerates to a
single path whose diameter is the corpus size. This probe plants exact
chains of growing depth and measures (rounds, wall seconds) so max_iter
guidance in docs/SCALE.md is backed by numbers, not folklore.

Each planted graph is `width` disjoint chains of `depth` edges each (width
keeps every round a real multi-partition shuffle rather than a toy
single-partition job). Convergence is verified structurally: every node's
label must equal its chain's minimum node id.

Usage: python tools/cc_chain_probe.py [depth1 depth2 ...]  (default 8 16 32 64)
Writes one markdown table row per depth to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.extensions import dedup_fuzzy
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

WIDTH = 2000  # disjoint chains per graph -> every round shuffles real data


def chain_edges(spark, depth: int, width: int = WIDTH):
    """width disjoint chains: node ids chain*10^6 + position."""
    return (
        spark.range(width)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("pos"),
            (F.col("id") * 1_000_000).alias("base"),
        )
        .select(
            (F.col("base") + F.col("pos")).alias("d1"),
            (F.col("base") + F.col("pos") + 1).alias("d2"),
        )
    )


def main() -> None:
    depths = [int(s) for s in sys.argv[1:]] or [8, 16, 32, 64]
    spark = get_session()
    # warm codegen + shuffle machinery so rows measure steady state
    dedup_fuzzy.connected_components(
        chain_edges(spark, 2, 64), max_iter=8, small_edge_limit=0
    ).count()

    print("| chain depth | nodes | rounds | wall (s) | s/round | labels correct |")
    print("|---|---|---|---|---|---|")
    for depth in depths:
        edges = chain_edges(spark, depth).localCheckpoint()
        n_nodes = WIDTH * (depth + 1)
        t0 = time.perf_counter()
        labels = dedup_fuzzy.connected_components(
            edges, max_iter=depth + 2, small_edge_limit=0
        )
        # correctness: every node's label is its chain's base id
        wrong = labels.filter(
            F.col("label") != (F.col("id") - F.col("id") % 1_000_000)
        ).count()
        dt = time.perf_counter() - t0
        rounds = dedup_fuzzy.LAST_CC_ROUNDS
        print(
            f"| {depth} | {n_nodes} | {rounds} | {dt:.2f} | "
            f"{dt / rounds:.2f} | {'yes' if wrong == 0 else f'NO ({wrong})'} |"
        )


if __name__ == "__main__":
    main()
