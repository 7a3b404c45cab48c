"""Measure the four ANN paths against exact brute force on the
embeddings table: recall@5, candidate fraction, and warm wall time —
the method-selection table for the similarity family.

Usage: python tools/ann_probe.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line per method; paste into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.extensions.ivf import ivf_topk
from big_data_processing_with_aws_glue_workshop_spark.extensions.ivfpq import ivfpq_topk
from big_data_processing_with_aws_glue_workshop_spark.extensions.pq import pq_topk
from big_data_processing_with_aws_glue_workshop_spark.extensions.similarity import ann_lsh_topk
from big_data_processing_with_aws_glue_workshop_spark.queries.vectors import dot, norm
from big_data_processing_with_aws_glue_workshop_spark.session import get_session


def exact_topk(emb, queries, k=5):
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("qnorm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nv"),
        norm(F.col("embedding")).alias("nnorm"),
    )
    from pyspark.sql import Window

    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * F.col("nnorm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def recall(truth: dict, approx_rows) -> float:
    got: dict = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


def sweep(spark, sf_dir: str) -> None:
    """--sweep: recall-vs-nprobe curve for the cell-probing methods —
    the knob curve that tells an operator what recall a probe budget
    buys (IVF and IVF-PQ share the coarse-probe recall ceiling)."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).persist()
    emb.count()
    queries = emb.filter(F.col("vec_id") < 20)
    truth: dict = {}
    for r in exact_topk(emb, queries).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for nprobe in (2, 4, 8, 16):
        for name, fn in (
            ("ivf", lambda: ivf_topk(emb, queries, k=5, nlist=16, nprobe=nprobe)),
            ("ivfpq", lambda: ivfpq_topk(
                emb, queries, kneighbors=5, nlist=16, nprobe=nprobe,
                m=8, k=32, rerank=48,
            )),
        ):
            rows = fn().collect()
            print(json.dumps({
                "method": name,
                "nprobe": nprobe,
                "recall_at_5": round(recall(truth, rows), 4),
            }))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--sweep"]
    if "--sweep" in sys.argv[1:]:
        sf_dir = args[0] if args else "/root/testdata/sf0.1"
        sweep(get_session(app_name="ann-probe"), sf_dir)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="ann-probe")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).persist()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 20)

    truth: dict = {}
    t0 = time.time()
    for r in exact_topk(emb, queries).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    t_exact = time.time() - t0

    methods = {
        "brute_force": (None, t_exact, 1.0, 1.0),
    }
    runs = {
        "lsh": lambda: ann_lsh_topk(emb, queries, k=5, n_planes=4, n_tables=16),
        "ivf": lambda: ivf_topk(emb, queries, k=5, nlist=16, nprobe=4),
        "pq": lambda: pq_topk(emb, queries, kneighbors=5, m=8, k=32, rerank=48),
        "ivfpq": lambda: ivfpq_topk(
            emb, queries, kneighbors=5, nlist=16, nprobe=4, m=8, k=32, rerank=48
        ),
    }
    fractions = {"lsh": None, "ivf": 4 / 16, "pq": None, "ivfpq": 4 / 16}
    for name, fn in runs.items():
        fn().count()  # warm (codebook/index fit + JIT)
        t0 = time.time()
        rows = fn().collect()
        wall = time.time() - t0
        methods[name] = (rows, wall, recall(truth, rows), fractions[name])

    for name, (rows, wall, rec, frac) in methods.items():
        print(
            json.dumps(
                {
                    "method": name,
                    "sf_dir": sf_dir,
                    "corpus": n,
                    "recall_at_5": round(rec, 4),
                    "warm_sec": round(wall, 2),
                    "probe_fraction": frac,
                }
            )
        )


if __name__ == "__main__":
    main()
