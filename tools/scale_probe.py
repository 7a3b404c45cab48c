"""Measured scaling probe for the embedding near-dup scale path.

Generates seeded random 64-dim corpora (same distribution family as the
driver's embeddings table) at growing n, then times the O(n^2) all-pairs
baseline against the clustered triangle-inequality path and checks they
emit the SAME pairs. Random uniform vectors are the WORST case for cluster
pruning (everything is weakly similar, most cluster pairs stay allowed) —
real embedding corpora cluster far more strongly — so these numbers are a
lower bound on the win.

Usage: python tools/scale_probe.py [n1 n2 ...]   (default 2000 8000 32000)
Writes one markdown table row per n to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.extensions.similarity import near_dup_pairs_clustered
from big_data_processing_with_aws_glue_workshop_spark.queries.vectors import dot, norm
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

THRESHOLD = 0.45
DIM = 64


def corpus(spark, n: int):
    # seeded uniform [-1, 1)^64, same shape as testdata embeddings
    return (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[(F.rand(seed=1000 + i) * 2 - 1) for i in range(DIM)]
            ).alias("embedding"),
        )
        .cache()
    )


def all_pairs(df):
    a = df.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        norm(F.col("embedding")).alias("na"),
    )
    b = df.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        norm(F.col("embedding")).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= THRESHOLD)
    )


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [2000, 8000, 32000]
    spark = get_session()
    # warm the Arrow python workers + codegen caches so rows measure the
    # steady state, not JVM/worker spin-up
    warm = corpus(spark, 500)
    near_dup_pairs_clustered(warm, threshold=THRESHOLD).count()
    all_pairs(warm).count()
    warm.unpersist()
    print("| n | all-pairs (s) | clustered (s) | pairs found | equal |")
    print("|---|---|---|---|---|")
    for n in sizes:
        df = corpus(spark, n)
        df.count()  # materialize the cache so both paths read identical input

        t0 = time.perf_counter()
        exact = sorted(
            (r["id_a"], r["id_b"], r["cos_sim"]) for r in all_pairs(df).collect()
        ) if n <= 8000 else None
        t_exact = time.perf_counter() - t0 if exact is not None else float("nan")

        t0 = time.perf_counter()
        pruned = sorted(
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in near_dup_pairs_clustered(df, threshold=THRESHOLD).collect()
        )
        t_clustered = time.perf_counter() - t0

        same = "n/a" if exact is None else str(pruned == exact)
        t_exact_s = "skipped" if exact is None else f"{t_exact:.2f}"
        print(f"| {n} | {t_exact_s} | {t_clustered:.2f} | {len(pruned)} | {same} |")
        df.unpersist()


if __name__ == "__main__":
    main()
